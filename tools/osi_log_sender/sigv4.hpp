// AWS Signature Version 4 signer for HTTP POST requests.
// C++ replacement for the reference's Go aws-sdk-go-v2 v4.Signer usage
// (reference: osi-ingest-test/ism-test/main.go:97-139).
#pragma once

#include <algorithm>
#include <map>
#include <string>
#include <vector>

#include "sha256.hpp"

namespace osi {

struct Credentials {
  std::string access_key;
  std::string secret_key;
  std::string session_token;  // optional (STS)
};

struct SignedRequest {
  // Header name -> value, including Authorization; lowercase names.
  std::map<std::string, std::string> headers;
  std::string canonical_request;  // exposed for testing/debugging
  std::string string_to_sign;
  std::string signature;
};

// amz_date: "YYYYMMDDTHHMMSSZ". host: e.g. "example.osis.amazonaws.com".
// path must start with '/' and be already URI-normalized (no query support —
// the OSI ingest POST has none, matching the reference tool).
inline SignedRequest sigv4_sign_post(const Credentials& creds, const std::string& host,
                                     const std::string& path, const std::string& payload,
                                     const std::string& region, const std::string& service,
                                     const std::string& amz_date) {
  SignedRequest out;
  const std::string date = amz_date.substr(0, 8);
  const std::string payload_hash = sha256_hex(payload);

  std::map<std::string, std::string> hdrs = {
      {"content-type", "application/json"},
      {"host", host},
      {"x-amz-content-sha256", payload_hash},
      {"x-amz-date", amz_date},
  };
  if (!creds.session_token.empty()) hdrs["x-amz-security-token"] = creds.session_token;

  std::string canonical_headers, signed_headers;
  for (const auto& [k, v] : hdrs) {  // std::map iterates sorted, as SigV4 requires
    canonical_headers += k + ":" + v + "\n";
    if (!signed_headers.empty()) signed_headers += ";";
    signed_headers += k;
  }

  out.canonical_request = "POST\n" + path + "\n" + /*query*/ "\n" + canonical_headers + "\n" +
                          signed_headers + "\n" + payload_hash;

  const std::string scope = date + "/" + region + "/" + service + "/aws4_request";
  out.string_to_sign = "AWS4-HMAC-SHA256\n" + amz_date + "\n" + scope + "\n" +
                       sha256_hex(out.canonical_request);

  auto as_str = [](const std::array<uint8_t, 32>& a) {
    return std::string(reinterpret_cast<const char*>(a.data()), a.size());
  };
  std::string k_date = as_str(hmac_sha256("AWS4" + creds.secret_key, date));
  std::string k_region = as_str(hmac_sha256(k_date, region));
  std::string k_service = as_str(hmac_sha256(k_region, service));
  std::string k_signing = as_str(hmac_sha256(k_service, "aws4_request"));
  out.signature = hex(hmac_sha256(k_signing, out.string_to_sign));

  out.headers = hdrs;
  out.headers["authorization"] = "AWS4-HMAC-SHA256 Credential=" + creds.access_key + "/" + scope +
                                 ", SignedHeaders=" + signed_headers +
                                 ", Signature=" + out.signature;
  return out;
}

}  // namespace osi
