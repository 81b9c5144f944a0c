"""Tests for the C++ OSI log sender (tools/osi_log_sender).

Reference parity: osi-ingest-test/ism-test/main.go — SigV4-signed synthetic
log batches POSTed to an OpenSearch Ingestion HTTP source. Here the signature
is verified against an independent Python SigV4 implementation, and the wire
protocol is exercised against a local HTTP server.
"""
import hashlib
import hmac
import json
import os
import subprocess
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

TOOL_DIR = os.path.join(os.path.dirname(__file__), "..", "tools", "osi_log_sender")
BIN = os.path.join(TOOL_DIR, "osi-log-sender")

ENV = {
    **os.environ,
    "AWS_ACCESS_KEY_ID": "AKIDEXAMPLE",
    "AWS_SECRET_ACCESS_KEY": "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
}

LOG_FIELDS = {
    "timestamp", "level", "source", "action", "status",
    "user_id", "request_id", "duration_ms", "ip", "message",
}


@pytest.fixture(scope="module")
def binary():
    subprocess.run(["make", "-s"], cwd=TOOL_DIR, check=True)
    assert os.path.exists(BIN)
    return BIN


def sigv4_signature_py(secret, amz_date, region, service, host, path, payload, token=None):
    """Independent SigV4 implementation (hashlib/hmac) for cross-checking."""
    payload_hash = hashlib.sha256(payload).hexdigest()
    headers = {
        "content-type": "application/json",
        "host": host,
        "x-amz-content-sha256": payload_hash,
        "x-amz-date": amz_date,
    }
    if token:
        headers["x-amz-security-token"] = token
    signed = ";".join(sorted(headers))
    # METHOD \n URI \n query(empty) \n canonical-headers("k:v\n" each) \n signed \n hash
    canonical = "POST\n%s\n\n%s\n%s\n%s" % (
        path,
        "".join(f"{k}:{headers[k]}\n" for k in sorted(headers)),
        signed,
        payload_hash,
    )
    date = amz_date[:8]
    scope = f"{date}/{region}/{service}/aws4_request"
    sts = "AWS4-HMAC-SHA256\n%s\n%s\n%s" % (
        amz_date, scope, hashlib.sha256(canonical.encode()).hexdigest())
    k = b"AWS4" + secret.encode()
    for part in (date, region, service, "aws4_request"):
        k = hmac.new(k, part.encode(), hashlib.sha256).digest()
    return hmac.new(k, sts.encode(), hashlib.sha256).hexdigest()


def test_self_test_vectors(binary):
    out = subprocess.run([binary, "--self-test"], capture_output=True, text=True)
    assert out.returncode == 0, out.stdout
    assert out.stdout.count("PASS") == 5 and "FAIL" not in out.stdout


def parse_dry_run(text):
    text = text[text.index("POST "):]  # skip the startup banner
    head, _, body = text.partition("\n\n")
    lines = head.splitlines()
    headers = {}
    for ln in lines[1:]:
        k, _, v = ln.partition(": ")
        headers[k] = v
    return headers, body.strip()


def test_signature_matches_independent_python_impl(binary):
    out = subprocess.run(
        [binary, "--dry-run", "--batch", "3", "--region", "ap-northeast-2",
         "--endpoint", "http://10.0.0.5:2021", "--path", "/ingest"],
        capture_output=True, text=True, env=ENV)
    assert out.returncode == 0, out.stderr
    headers, body = parse_dry_run(out.stdout)

    # body: a JSON array of 3 well-formed log entries
    logs = json.loads(body)
    assert len(logs) == 3
    for entry in logs:
        assert set(entry) == LOG_FIELDS
        assert entry["level"] in {"DEBUG", "INFO", "WARN", "ERROR", "FATAL"}
        assert 1 <= entry["duration_ms"] <= 5000

    # payload hash header is the SHA-256 of the body
    assert headers["x-amz-content-sha256"] == hashlib.sha256(body.encode()).hexdigest()

    want = sigv4_signature_py(
        ENV["AWS_SECRET_ACCESS_KEY"], headers["x-amz-date"], "ap-northeast-2",
        "osis", "10.0.0.5:2021", "/ingest", body.encode())
    auth = headers["authorization"]
    assert auth.endswith(f"Signature={want}"), auth
    assert "Credential=AKIDEXAMPLE/" in auth
    assert "SignedHeaders=content-type;host;x-amz-content-sha256;x-amz-date" in auth


def test_session_token_included_in_signature(binary):
    env = {**ENV, "AWS_SESSION_TOKEN": "tok123"}
    out = subprocess.run([binary, "--dry-run"], capture_output=True, text=True, env=env)
    headers, body = parse_dry_run(out.stdout)
    assert headers["x-amz-security-token"] == "tok123"
    assert "x-amz-security-token" in headers["authorization"]
    want = sigv4_signature_py(
        ENV["AWS_SECRET_ACCESS_KEY"], headers["x-amz-date"], "us-east-1",
        "osis", "127.0.0.1:2021", "/logs", body.encode(), token="tok123")
    assert headers["authorization"].endswith(f"Signature={want}")


def test_missing_credentials_fails(binary):
    env = {k: v for k, v in os.environ.items() if not k.startswith("AWS_")}
    out = subprocess.run([binary, "--dry-run"], capture_output=True, text=True, env=env)
    assert out.returncode == 1
    assert "AWS_ACCESS_KEY_ID" in out.stderr


@pytest.mark.parametrize("variant", ["asan", "tsan"])
def test_sanitizer_builds_run_clean(variant):
    """Sanitized builds pass the crypto self-test and a signed dry-run with
    zero reports (mirrors tools/idf_compute sanitizer coverage)."""
    r = subprocess.run(["make", "-C", TOOL_DIR, f"osi-log-sender-{variant}"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"{variant} build unavailable: {r.stderr[-200:]}")
    exe = os.path.join(TOOL_DIR, f"osi-log-sender-{variant}")
    r = subprocess.run([exe, "--self-test"], capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    r = subprocess.run([exe, "--dry-run", "--batch", "5"],
                       capture_output=True, text=True, env=ENV)
    assert r.returncode == 0, r.stderr
    for report in ("ThreadSanitizer", "AddressSanitizer",
                   "runtime error"):  # UBSan prints 'runtime error:'
        assert report not in r.stderr, r.stderr


def test_live_post_to_local_server(binary):
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append((dict(self.headers), self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"{}")

        def log_message(self, *a):  # quiet
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        out = subprocess.run(
            [binary, "--endpoint", f"http://127.0.0.1:{port}", "--count", "4",
             "--batch", "2", "--interval", "0.05"],
            capture_output=True, text=True, env=ENV, timeout=30)
        assert out.returncode == 0, out.stderr
        assert "Reached target count: 4" in out.stdout
    finally:
        srv.shutdown()

    assert len(received) == 2
    for headers, body in received:
        logs = json.loads(body)
        assert len(logs) == 2 and all(set(e) == LOG_FIELDS for e in logs)
        # server-side signature validation: recompute from the secret
        want = sigv4_signature_py(
            ENV["AWS_SECRET_ACCESS_KEY"], headers["x-amz-date"], "us-east-1",
            "osis", f"127.0.0.1:{port}", "/logs", body)
        assert headers["authorization"].endswith(f"Signature={want}")
