#!/usr/bin/env python3
"""Merge a check_correctness.py output file into a CORRECTNESS_sfN.json
certification artifact (r15 verdict items 2-3: widen the sf10/sf100
certs batch by batch without re-running the whole catalog).

    python tools/merge_cert.py CORRECTNESS_sf100.json /tmp/correctness_local.json [note-suffix]

Per-key rows are REPLACED by the new run (latest wins); checked/fails/
failing_keys/total_sec are recomputed from the merged result set.
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    cert_path, run_path = sys.argv[1], sys.argv[2]
    suffix = sys.argv[3] if len(sys.argv) > 3 else None
    cert = json.load(open(cert_path))
    run = json.load(open(run_path))
    cert.setdefault("results", {}).update(run)
    res = cert["results"]
    fails = [
        k
        for k, r in res.items()
        if not (
            r.get("rows_match") and r.get("schema_match") and r.get("hash_match")
        )
        or r.get("err")
    ]
    cert["checked"] = len(res)
    cert["fails"] = len(fails)
    cert["failing_keys"] = fails
    cert["total_sec"] = round(sum(r.get("sec", 0) for r in res.values()), 1)
    if suffix:
        cert["note"] = cert.get("note", "") + " | " + suffix
    json.dump(cert, open(cert_path, "w"), indent=1, default=str)
    print(
        json.dumps(
            {"checked": cert["checked"], "fails": cert["fails"], "failing": fails}
        )
    )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
