"""Verify real-data archives against datasets/MANIFEST.json.

Zero-egress escrow gate (VERDICT r2 item 9): for every manifest entry that
exists on disk this checks the CSV header against the published tgb schema,
computes its sha256, and either RECORDS it (first sight -- trust-on-first-
use, the manifest is updated in place) or VERIFIES it against the recorded
value. Missing files are reported, not errors (the archives cannot be
fetched here). Exit code 1 on any schema or checksum violation.

Usage:  python tools/verify_datasets.py [--manifest datasets/MANIFEST.json]
"""

from __future__ import annotations

import argparse
import csv
import hashlib
import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def sha256_of(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def check_csv_schema(path: Path, schema: dict) -> str | None:
    with open(path, newline="") as f:
        header = [c.strip().lower() for c in next(csv.reader(f))]
    options = schema.get("header_any_of", [])
    if options and not any(set(o) <= set(header) for o in options):
        return f"header {header} matches none of {options}"
    return None


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", default=str(ROOT / "datasets" / "MANIFEST.json"))
    args = ap.parse_args(argv)

    mpath = Path(args.manifest)
    manifest = json.loads(mpath.read_text())
    failures, updated = [], False

    for name, entry in manifest["files"].items():
        path = ROOT / entry["path"]
        if not path.exists():
            print(f"{name}: ABSENT ({entry['path']}) -- see 'source' for the mirror procedure")
            continue
        if path.suffix == ".csv":
            err = check_csv_schema(path, entry.get("schema", {}))
            if err:
                failures.append(f"{name}: schema violation: {err}")
                continue
        digest = sha256_of(path)
        if entry.get("sha256") is None:
            entry["sha256"] = digest
            updated = True
            print(f"{name}: RECORDED sha256 {digest[:16]}... (trust-on-first-use)")
        elif entry["sha256"] != digest:
            failures.append(
                f"{name}: checksum mismatch: manifest {entry['sha256'][:16]}..., "
                f"file {digest[:16]}..."
            )
        else:
            print(f"{name}: OK (sha256 verified)")

    if updated:
        mpath.write_text(json.dumps(manifest, indent=2) + "\n")
        print(f"manifest updated: {mpath}")
    for f in failures:
        print(f"FAIL {f}", file=sys.stderr)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
