"""Opt-in driver-side phase timing (``SPARK_GRAFT_TIMING=1``).

Maintenance jobs are measured end-to-end by bench.py; this probe breaks a
job's wall clock into its driver-visible phases (plan / group writes /
stats harvest / ledger / commit) so the two-cluster-size scaling protocol
can attribute the serial floor to a specific phase instead of guessing.
Output is one stderr line per phase — grep for ``[timing]``.
"""

from __future__ import annotations

import os
import sys
import time

ENABLED = os.environ.get("SPARK_GRAFT_TIMING") == "1"


class phase_timer:
    """``with phase_timer("cluster.harvest"):`` — prints elapsed seconds."""

    def __init__(self, tag: str):
        self.tag = tag

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        if ENABLED:
            print(f"[timing] {self.tag} {time.time() - self.t0:.3f}s",
                  file=sys.stderr, flush=True)
        return False
