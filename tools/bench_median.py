#!/usr/bin/env python3
"""Build the committed bench baseline from N sidecar runs: per-query
medians plus per-run totals, machine-parseable. Dev tooling only.

Usage: python3 tools/bench_median.py OUT.json RUN1.json RUN2.json ...
"""
import json
import statistics
import sys


def main(out_path, run_paths):
    runs = [json.load(open(p)) for p in run_paths]
    # all runs must cover the same query set: a missing query would
    # KeyError below, and an extra one would be silently dropped from
    # the medians — both can skew a committed baseline when sidecar
    # runs straddle a query-set change
    key_sets = [set(r["queries"]) for r in runs]
    if any(ks != key_sets[0] for ks in key_sets[1:]):
        for p, ks in zip(run_paths, key_sets):
            diff = ks ^ key_sets[0]
            if diff:
                raise SystemExit(
                    f"query sets differ across runs: {p} vs {run_paths[0]}: {sorted(diff)}")
    queries = sorted(runs[0]["queries"])
    medians = {
        q: round(statistics.median(r["queries"][q] for r in runs), 3)
        for q in queries
    }
    doc = {
        "metric": f"total_median_of_{len(runs)}",
        "value": round(statistics.median(r["value"] for r in runs), 1),
        "unit": "sec",
        "sf": runs[0].get("sf"),
        "runs": [round(r["value"], 1) for r in runs],
        "median_query_total": round(sum(medians.values()), 1),
        "queries": medians,
    }
    # host-speed calibration (pure-CPU microbench emitted per run):
    # normalize cross-round totals by the calib ratio before reading a
    # delta as a code regression
    # since round 12 each run brackets the suite (pre+post, min kept)
    # and adds an I/O-shaped probe next to the pure-CPU one
    for field in ("calib_sec", "io_calib_sec",
                  "calib_sec_pre", "calib_sec_post",
                  "io_calib_sec_pre", "io_calib_sec_post"):
        vals = [r[field] for r in runs if field in r]
        if vals:
            doc[field] = round(statistics.median(vals), 3)
            if field in ("calib_sec", "io_calib_sec"):
                doc[field + "_runs"] = [round(c, 3) for c in vals]
    if "calib_sec" in doc:
        doc["calib_runs"] = doc.pop("calib_sec_runs")  # legacy field name
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(out_path, "total:", doc["value"], "runs:", doc["runs"])


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
