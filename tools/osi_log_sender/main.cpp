// osi-log-sender: synthetic log generator POSTing SigV4-signed batches to an
// OpenSearch Ingestion (OSIS) HTTP source endpoint at a fixed rate.
//
// C++17 replacement for the reference's Go tool
// (reference: osi-ingest-test/ism-test/main.go:1-209): same flags
// (--endpoint --path --region --interval --batch --count), same LogEntry JSON
// shape, same SigV4-over-POST protocol (service "osis"), graceful SIGINT with
// a total-sent summary. Additions for this zero-egress environment:
//   --dry-run         print one signed request (headers + body) and exit
//   --self-test       run SHA-256 / HMAC-SHA256 known-answer vectors and exit
//   http:// endpoints use a built-in POSIX-socket client (local test servers);
//   https:// endpoints delegate transport to the system `curl` binary, with
//   headers signed here (no TLS stack is linked in this image).
//
// Credentials come from AWS_ACCESS_KEY_ID / AWS_SECRET_ACCESS_KEY /
// AWS_SESSION_TOKEN, like the Go SDK's default chain (env-only subset).

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <chrono>
#include <csignal>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <random>
#include <sstream>
#include <string>
#include <thread>
#include <vector>

#include "sigv4.hpp"

namespace {

std::atomic<bool> g_stop{false};
void on_signal(int) { g_stop = true; }

const char* kLevels[] = {"DEBUG", "INFO", "WARN", "ERROR", "FATAL"};
const char* kSources[] = {"api-gateway", "auth-service", "user-service", "payment-service",
                          "order-service"};
const char* kActions[] = {"login", "logout", "create", "update", "delete", "read", "search",
                          "export"};
const char* kStatuses[] = {"success", "failure", "pending", "timeout", "cancelled"};

std::mt19937_64& rng() {
  static std::mt19937_64 r(std::random_device{}());
  return r;
}

int rand_int(int max) { return int(rng()() % uint64_t(max)); }

template <size_t N>
const char* rand_choice(const char* (&arr)[N]) {
  return arr[rand_int(int(N))];
}

std::string uuid4() {
  char buf[37];
  uint64_t a = rng()(), b = rng()();
  std::snprintf(buf, sizeof(buf), "%08x-%04x-%04x-%04x-%012llx", uint32_t(a >> 32),
                uint16_t(a >> 16), uint16_t((a & 0x0fff) | 0x4000),
                uint16_t(((b >> 48) & 0x3fff) | 0x8000),
                static_cast<unsigned long long>(b & 0xffffffffffffULL));
  return buf;
}

std::string rand_ip() {
  char buf[16];
  std::snprintf(buf, sizeof(buf), "%d.%d.%d.%d", rand_int(256), rand_int(256), rand_int(256),
                rand_int(256));
  return buf;
}

std::string now_rfc3339() {
  std::time_t t = std::time(nullptr);
  char buf[32];
  std::strftime(buf, sizeof(buf), "%Y-%m-%dT%H:%M:%SZ", std::gmtime(&t));
  return buf;
}

std::string now_amz_date() {
  std::time_t t = std::time(nullptr);
  char buf[20];
  std::strftime(buf, sizeof(buf), "%Y%m%dT%H%M%SZ", std::gmtime(&t));
  return buf;
}

std::string json_escape(const std::string& s) {
  std::string out;
  for (char c : s) {
    if (c == '"' || c == '\\')
      out += std::string("\\") + c;
    else if (uint8_t(c) < 0x20) {
      char buf[8];
      std::snprintf(buf, sizeof(buf), "\\u%04x", c);
      out += buf;
    } else
      out += c;
  }
  return out;
}

// One synthetic entry; field set mirrors the reference LogEntry struct
// (osi-ingest-test/ism-test/main.go:38-49).
std::string generate_log_json() {
  std::string level = rand_choice(kLevels);
  std::string action = rand_choice(kActions);
  std::string msg;
  if (level == "DEBUG") msg = "Debug trace for " + action + " operation";
  else if (level == "INFO") msg = "Successfully completed " + action;
  else if (level == "WARN") msg = "Slow response detected during " + action;
  else if (level == "ERROR") msg = "Failed to execute " + action + ": connection timeout";
  else msg = "Critical failure in " + action + ": service unavailable";

  std::ostringstream o;
  o << "{\"timestamp\":\"" << now_rfc3339() << "\",\"level\":\"" << level << "\",\"source\":\""
    << rand_choice(kSources) << "\",\"action\":\"" << action << "\",\"status\":\""
    << rand_choice(kStatuses) << "\",\"user_id\":\"user-" << (rand_int(10000) + 1)
    << "\",\"request_id\":\"" << uuid4() << "\",\"duration_ms\":" << (rand_int(5000) + 1)
    << ",\"ip\":\"" << rand_ip() << "\",\"message\":\"" << json_escape(msg) << "\"}";
  return o.str();
}

struct Url {
  std::string scheme, host, port, path;
};

bool parse_url(const std::string& url, Url* out) {
  size_t p = url.find("://");
  if (p == std::string::npos) return false;
  out->scheme = url.substr(0, p);
  std::string rest = url.substr(p + 3);
  size_t slash = rest.find('/');
  std::string hostport = slash == std::string::npos ? rest : rest.substr(0, slash);
  out->path = slash == std::string::npos ? "" : rest.substr(slash);
  size_t colon = hostport.find(':');
  out->host = colon == std::string::npos ? hostport : hostport.substr(0, colon);
  out->port = colon == std::string::npos ? (out->scheme == "https" ? "443" : "80")
                                         : hostport.substr(colon + 1);
  return !out->host.empty();
}

// Plain-HTTP POST over a POSIX socket. Returns HTTP status, or -1 on error.
int http_post(const Url& u, const std::string& path, const osi::SignedRequest& sig,
              const std::string& body, std::string* resp_line) {
  addrinfo hints{}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(u.host.c_str(), u.port.c_str(), &hints, &res) != 0) return -1;
  int fd = -1;
  for (addrinfo* ai = res; ai; ai = ai->ai_next) {
    fd = socket(ai->ai_family, ai->ai_socktype, ai->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, ai->ai_addr, ai->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  if (fd < 0) return -1;

  std::ostringstream req;
  req << "POST " << path << " HTTP/1.1\r\n";
  for (const auto& [k, v] : sig.headers)
    if (k != "host") req << k << ": " << v << "\r\n";
  req << "host: " << u.host << (u.port == "80" ? "" : ":" + u.port) << "\r\n";
  req << "content-length: " << body.size() << "\r\nconnection: close\r\n\r\n" << body;
  std::string data = req.str();
  size_t off = 0;
  while (off < data.size()) {
    ssize_t n = send(fd, data.data() + off, data.size() - off, 0);
    if (n <= 0) {
      close(fd);
      return -1;
    }
    off += size_t(n);
  }
  char buf[1024];
  ssize_t n = recv(fd, buf, sizeof(buf) - 1, 0);
  close(fd);
  if (n <= 0) return -1;
  buf[n] = '\0';
  if (resp_line) {
    const char* eol = std::strstr(buf, "\r\n");
    *resp_line = eol ? std::string(buf, size_t(eol - buf)) : std::string(buf);
  }
  int status = -1;
  std::sscanf(buf, "HTTP/%*s %d", &status);
  return status;
}

// HTTPS transport via the system curl binary (headers already signed here).
// The real HTTP status is captured through a temp file: curl exits 0 even on
// 4xx/5xx, so trusting the exit code alone would report rejected batches
// (e.g. 403 on expired credentials) as sent.
// popen runs a shell: single-quote every interpolated value and refuse
// values containing a quote (an endpoint or session token like
// "https://h/'; rm -rf ~;'" would otherwise execute arbitrary commands).
std::string shell_quote(const std::string& v, bool* ok) {
  if (v.find('\'') != std::string::npos) { *ok = false; return ""; }
  return "'" + v + "'";
}

int https_post_via_curl(const std::string& url, const osi::SignedRequest& sig,
                        const std::string& body) {
  char tmpl[] = "/tmp/osi-status-XXXXXX";
  int tmpfd = mkstemp(tmpl);
  if (tmpfd < 0) return -1;
  close(tmpfd);
  bool q_ok = true;
  std::string cmd = "curl -s -o /dev/null -w '%{http_code}' -X POST --max-time 30";
  for (const auto& [k, v] : sig.headers)
    if (k != "host") cmd += " -H " + shell_quote(k + ": " + v, &q_ok);
  cmd += " --data-binary @- " + shell_quote(url, &q_ok) + " > " + tmpl;
  if (!q_ok) {
    std::fprintf(stderr, "refusing URL/header containing a single quote\n");
    unlink(tmpl);
    return -1;
  }
  FILE* p = popen(cmd.c_str(), "w");
  if (!p) {
    unlink(tmpl);
    return -1;
  }
  std::fwrite(body.data(), 1, body.size(), p);
  int rc = pclose(p);
  int status = -1;
  if (FILE* f = std::fopen(tmpl, "r")) {
    if (std::fscanf(f, "%d", &status) != 1) status = -1;
    std::fclose(f);
  }
  unlink(tmpl);
  return rc == 0 ? status : -1;
}

int self_test() {
  int fails = 0;
  auto expect = [&](const std::string& name, const std::string& got, const std::string& want) {
    bool ok = got == want;
    std::printf("%s %s\n", ok ? "PASS" : "FAIL", name.c_str());
    if (!ok) {
      std::printf("  got  %s\n  want %s\n", got.c_str(), want.c_str());
      ++fails;
    }
  };
  // FIPS 180-4 known answers
  expect("sha256(empty)", osi::sha256_hex(""),
         "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855");
  expect("sha256(abc)", osi::sha256_hex("abc"),
         "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad");
  // RFC 4231 test case 2 (short key path) and 1 (0x0b*20 key)
  expect("hmac(rfc4231#1)", osi::hex(osi::hmac_sha256(std::string(20, '\x0b'), "Hi There")),
         "b0344c61d8db38535ca8afceaf0bf12b881dc200c9833da726e9376c2e32cff7");
  expect("hmac(rfc4231#2)", osi::hex(osi::hmac_sha256("Jefe", "what do ya want for nothing?")),
         "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843");
  // >64-byte key path (RFC 4231 test case 6)
  expect("hmac(rfc4231#6)",
         osi::hex(osi::hmac_sha256(std::string(131, '\xaa'),
                                   "Test Using Larger Than Block-Size Key - Hash Key First")),
         "60e431591ee0b67f0d8a26aacbf5b77f8e0bc6213728c5140546040f0ee37f54");
  return fails == 0 ? 0 : 1;
}

}  // namespace

int main(int argc, char** argv) {
  std::string endpoint = "http://127.0.0.1:2021";
  std::string path = "/logs";
  std::string region = "us-east-1";
  double interval_s = 1.0;
  int batch = 3, count = 0;
  bool dry_run = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string { return i + 1 < argc ? argv[++i] : ""; };
    if (a == "--endpoint") endpoint = next();
    else if (a == "--path") path = next();
    else if (a == "--region") region = next();
    else if (a == "--interval") interval_s = std::atof(next().c_str());
    else if (a == "--batch") batch = std::atoi(next().c_str());
    else if (a == "--count") count = std::atoi(next().c_str());
    else if (a == "--dry-run") dry_run = true;
    else if (a == "--self-test") return self_test();
    else {
      std::fprintf(stderr,
                   "usage: %s [--endpoint URL] [--path P] [--region R] [--interval SECONDS]\n"
                   "          [--batch N] [--count TOTAL] [--dry-run] [--self-test]\n",
                   argv[0]);
      return a == "--help" || a == "-h" ? 0 : 2;
    }
  }

  osi::Credentials creds;
  if (const char* v = std::getenv("AWS_ACCESS_KEY_ID")) creds.access_key = v;
  if (const char* v = std::getenv("AWS_SECRET_ACCESS_KEY")) creds.secret_key = v;
  if (const char* v = std::getenv("AWS_SESSION_TOKEN")) creds.session_token = v;
  if (creds.access_key.empty() || creds.secret_key.empty()) {
    std::fprintf(stderr, "Failed to load AWS config: AWS_ACCESS_KEY_ID/AWS_SECRET_ACCESS_KEY "
                         "must be set\n");
    return 1;
  }

  Url u;
  if (!parse_url(endpoint, &u)) {
    std::fprintf(stderr, "bad --endpoint %s\n", endpoint.c_str());
    return 2;
  }
  // Path resolution, SAME for both schemes: an explicit --path overrides
  // the endpoint's path; otherwise the endpoint's own path is used. The
  // https branch used to append --path to the full endpoint (double path,
  // broken SigV4 canonical request) while http dropped the endpoint path.
  if (u.path.empty() || u.path == "/") u.path = path;
  path = u.path;
  // Host must match what the transport sends: include a non-default port
  // for BOTH schemes (https on :8443 used to sign a host without the
  // port while curl sent one with it -> guaranteed 403).
  bool default_port = (u.scheme == "http" && u.port == "80") ||
                      (u.scheme == "https" && u.port == "443");
  std::string sign_host = u.host + (default_port ? "" : ":" + u.port);

  std::signal(SIGINT, on_signal);
  std::signal(SIGTERM, on_signal);

  std::printf("Starting log sender\n  Endpoint: %s%s\n  Region:   %s\n  Interval: %gs\n"
              "  Batch:    %d\n  Count:    %s\n\n",
              endpoint.c_str(), path.c_str(), region.c_str(), interval_s, batch,
              count > 0 ? std::to_string(count).c_str() : "infinite");

  int sent = 0;
  while (!g_stop) {
    std::string body = "[";
    for (int i = 0; i < batch; ++i) body += (i ? "," : "") + generate_log_json();
    body += "]";

    auto sig = osi::sigv4_sign_post(creds, sign_host, path, body, region, "osis", now_amz_date());

    if (dry_run) {
      std::printf("POST %s%s\n", endpoint.c_str(), path.c_str());
      for (const auto& [k, v] : sig.headers) std::printf("%s: %s\n", k.c_str(), v.c_str());
      std::printf("\n%s\n", body.c_str());
      return 0;
    }

    int status;
    std::string resp;
    if (u.scheme == "https")
      status = https_post_via_curl(u.scheme + "://" + sign_host + path, sig, body);
    else
      status = http_post(u, path, sig, body, &resp);

    if (status != 200) {
      std::fprintf(stderr, "Error: unexpected status: %d %s\n", status, resp.c_str());
    } else {
      sent += batch;
      std::time_t t = std::time(nullptr);
      char ts[16];
      std::strftime(ts, sizeof(ts), "%H:%M:%S", std::localtime(&t));
      std::printf("[%s] Sent %d docs (total: %d)\n", ts, batch, sent);
    }
    if (count > 0 && sent >= count) {
      std::printf("Reached target count: %d\n", sent);
      return 0;
    }
    auto deadline = std::chrono::steady_clock::now() +
                    std::chrono::microseconds(int64_t(interval_s * 1e6));
    while (!g_stop && std::chrono::steady_clock::now() < deadline)
      std::this_thread::sleep_for(std::chrono::milliseconds(20));
  }
  std::printf("\nShutting down...\nTotal sent: %d documents\n", sent);
  return 0;
}
