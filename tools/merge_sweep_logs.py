#!/usr/bin/env python3
"""Merge one or more oracle_check logs into a single sweep artifact
JSON: {"sf": ..., "total": N, "pass": N, "fail": N,
"queries": {name: {"status": "pass"|"fail", "rows": N|null,
"detail": str|null}}}. Later logs override earlier ones (rerun wins).

Usage: python3 tools/merge_sweep_logs.py <sf_label> <out.json> <log> [log...]
"""
import json
import re
import sys


def main(sf_label, out_path, *logs):
    queries = {}
    for path in logs:
        with open(path) as f:
            for line in f:
                m = re.match(r"PASS (\S+) \((\d+) rows\)", line)
                if m:
                    queries[m.group(1)] = {
                        "status": "pass", "rows": int(m.group(2)),
                        "detail": None}
                    continue
                m = re.match(r"FAIL (\S+): (.*)", line)
                if m:
                    queries[m.group(1)] = {
                        "status": "fail", "rows": None,
                        "detail": m.group(2).strip()[:300]}
    n_pass = sum(1 for v in queries.values() if v["status"] == "pass")
    out = {"sf": sf_label, "total": len(queries), "pass": n_pass,
           "fail": len(queries) - n_pass,
           "queries": dict(sorted(queries.items()))}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"{sf_label}: {n_pass}/{len(queries)} pass -> {out_path}")
    for k, v in sorted(queries.items()):
        if v["status"] == "fail":
            print(f"  FAIL {k}: {v['detail']}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], *sys.argv[3:])
