"""Interleaved best-of scaling trials that REUSE an existing pristine template.

Same protocol and estimator as ``bench.py --scaling`` (per-phase minimum
across interleaved fresh-JVM trials; see BENCH/BASELINE.md), but pointed at a
template directory prepared earlier (``bench.py --prepare-template``), so a
batch costs only the measured cores — no re-ingest.  Each raw trial JSON is
printed as it lands (capture with ``nohup ... > out.jsonl``); the final line
is the aggregate in the exact shape ``run_scaling`` returns, consumable by
``scripts/merge_scaling_runs.py`` and ``bench.write_baseline_md``.

Usage:
    python scripts/scaling_batch.py --template-root /dev/shm/tmpl4x \
        --trials 12 --n-small 2 --n-big 8 --out BENCH/run4x_r3h.json
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--template-root", required=True)
    ap.add_argument("--trials", type=int, default=8)
    ap.add_argument("--n-small", type=int, default=2)
    ap.add_argument("--n-big", type=int, default=8)
    ap.add_argument("--big-per-small", type=int, default=1,
                    help="big-arm trials per small-arm trial in each round. "
                    "The per-phase minimum converges asymmetrically: the big "
                    "arm needs B simultaneously unstolen host cores where the "
                    "small arm needs only S, so with equal trial counts the "
                    "big arm's minimum sits further above its true capacity "
                    "floor and the efficiency estimate is biased LOW. Extra "
                    "big-arm trials tighten the slow-converging minimum; the "
                    "interleaved small trials remain the same-window control.")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "16g")  # fixed shared heap (see METHODOLOGY_r3)
    env.pop("SPARK_GRAFT_TIMING", None)  # probe must never run inside measured trials

    results: dict[int, list[dict]] = {}
    round_arms = (args.n_small,) + (args.n_big,) * args.big_per_small
    for i in range(args.trials):
        for cpus in round_arms:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--use-template", args.template_root, "--cpus", str(cpus)],
                capture_output=True, text=True, timeout=3600, env=env,
            )
            lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                print(json.dumps({"trial": i, "cpus": cpus, "error": proc.stderr[-800:]}),
                      flush=True)
                continue
            run = json.loads(lines[-1])
            results.setdefault(cpus, []).append(run)
            print(json.dumps({"trial": i, **run}), flush=True)

    def best(cpus: int):
        runs = results[cpus]
        c = min(r["queries"]["compact"] for r in runs)
        z = min(r["queries"]["cluster_zorder"] for r in runs)
        return c, z, runs[0]["turns"] / (c + z)

    c_s, z_s, thr_s = best(args.n_small)
    c_b, z_b, thr_b = best(args.n_big)
    turns = results[args.n_small][0]["turns"]
    out = {
        "n_small": args.n_small, "n_big": args.n_big,
        "throughput_small": round(thr_s, 1), "throughput_big": round(thr_b, 1),
        "best_phases": {"small": {"compact": c_s, "cluster_zorder": z_s},
                        "big": {"compact": c_b, "cluster_zorder": z_b}},
        "scaling_efficiency": round(thr_b / ((args.n_big / args.n_small) * thr_s), 3),
        "trials": args.trials,
        # reused template: ingest cost was paid when the template was built
        "template_ingest": {"ingest_sec": 0.0, "turns": turns, "n_files": None,
                            "reused_template": args.template_root},
        "runs": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f)
    print(json.dumps({k: v for k, v in out.items() if k != "runs"}))


if __name__ == "__main__":
    main()
