"""AI Hub dataset download CLI.

Reference: /aihubshell (262-line bash CLI for api.aihub.or.kr: API-key auth,
file-tree listing, ranged downloads). This python equivalent keeps the same
operations; it requires network access and an AIHUB_APIKEY, so on air-gapped
hosts it exists for completeness and fails fast with a clear message.

Usage:
  python scripts/aihub_download.py list                     # dataset list
  python scripts/aihub_download.py tree --dataset-key K     # file tree
  python scripts/aihub_download.py download --dataset-key K --file-sn all
"""
import argparse
import os
import sys
import urllib.request

BASE = "https://api.aihub.or.kr"


def _request(path: str, headers=None) -> bytes:
    req = urllib.request.Request(BASE + path, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.read()
    except Exception as e:
        sys.exit(f"AI Hub unreachable ({e}). This host may be air-gapped; "
                 f"drop raw data under $SPLADE_RAW_DATA instead.")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("command", choices=["list", "tree", "download"])
    p.add_argument("--dataset-key", default=None)
    p.add_argument("--file-sn", default="all")
    p.add_argument("--output", default=".")
    args = p.parse_args()
    key = os.environ.get("AIHUB_APIKEY")
    if args.command == "list":
        print(_request("/info/dataset.do").decode("utf-8", "replace"))
        return
    if not args.dataset_key:
        sys.exit("--dataset-key required")
    if args.command == "tree":
        print(_request(f"/info/{args.dataset_key}.do").decode("utf-8", "replace"))
        return
    if not key:
        sys.exit("set AIHUB_APIKEY")
    data = _request(
        f"/down/0.5/{args.dataset_key}.do?fileSn={args.file_sn}",
        headers={"apikey": key})
    out = os.path.join(args.output, f"aihub_{args.dataset_key}.tar")
    with open(out, "wb") as f:
        f.write(data)
    print(f"wrote {out} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
