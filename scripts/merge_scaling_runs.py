"""Merge two same-input scaling-protocol runs into one best-of-N result and
rewrite BENCH/BASELINE.md.

The per-phase-minimum estimator needs enough trials for BOTH arms to catch a
clean host window (hypervisor steal bursts showed 8x swings across identical
fresh-JVM trials). Runs merge ONLY if they used the same template parameters
(turns, n_files, code) — asserted via the turns count.

Usage: python scripts/merge_scaling_runs.py runA.json runB.json
(each file: the final JSON line printed by `bench.py --scaling`)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import write_baseline_md


def load(path: str) -> dict:
    lines = [l for l in open(path) if l.startswith("{")]
    return json.loads(lines[-1])


def main():
    runs = [load(p) for p in sys.argv[1:]]
    base = runs[0]
    merged = {
        "n_small": base["n_small"], "n_big": base["n_big"],
        "trials": 0, "template_ingest": base["template_ingest"],
        "runs": {},
    }
    for r in runs:
        assert r["n_small"] == base["n_small"] and r["n_big"] == base["n_big"]
        for cpus, trials in r["runs"].items():
            assert trials[0]["turns"] == base["template_ingest"]["turns"], \
                "different inputs cannot be merged"
            merged["runs"].setdefault(str(cpus), []).extend(trials)
    merged["trials"] = max(len(v) for v in merged["runs"].values())

    def best(cpus):
        rs = merged["runs"][str(cpus)]
        c = min(r["queries"]["compact"] for r in rs)
        z = min(r["queries"]["cluster_zorder"] for r in rs)
        return c, z, rs[0]["turns"] / (c + z)

    c_s, z_s, thr_s = best(base["n_small"])
    c_b, z_b, thr_b = best(base["n_big"])
    merged["best_phases"] = {"small": {"compact": c_s, "cluster_zorder": z_s},
                             "big": {"compact": c_b, "cluster_zorder": z_b}}
    merged["throughput_small"] = round(thr_s, 1)
    merged["throughput_big"] = round(thr_b, 1)
    merged["scaling_efficiency"] = round(
        thr_b / ((base["n_big"] / base["n_small"]) * thr_s), 3)
    write_baseline_md(merged)
    print(json.dumps({k: v for k, v in merged.items() if k != "runs"}))


if __name__ == "__main__":
    main()
