"""Opt-in sub-phase wall-time attribution for operator internals.

The scaling bench's per-stage table (BENCH_SCALING.json) attributes wall
time to pipeline stages, but the two heavyweight stages (verify,
containment) are multi-phase: each contains eager materialization
barriers (localCheckpoint / persist+first-use) whose cost the stage total
hides. When ``SPARK_GRAFT_PHASE_TIMING=1``, the ``phase()`` wrapper below
times each such barrier and emits one JSON line per phase to stderr, so a
scaling run at two parallelism levels yields a per-PHASE efficiency table
instead of a per-stage one.

Off by default: ``phase()`` is a zero-cost passthrough unless the env var
is set, so production plans are untouched (in particular, no extra
``count()`` actions are ever added outside probe runs).
"""

from __future__ import annotations

import json
import os
import sys
import time

_ENABLED = os.environ.get("SPARK_GRAFT_PHASE_TIMING") == "1"


def enabled() -> bool:
    return _ENABLED


def phase(name: str, fn, count: bool = False):
    """Run ``fn()`` (an operator sub-phase returning a DataFrame), timing it
    when phase timing is on. ``count=True`` additionally forces a count()
    -- required to materialize LAZY barriers (``persist()`` frames) whose
    cost would otherwise land in whichever later phase touches them first;
    eager barriers (``localCheckpoint()``) pass count=False because their
    work happens inside ``fn()`` itself."""
    if not _ENABLED:
        return fn()
    t0 = time.time()
    out = fn()
    rows = out.count() if count else None
    rec = {"phase": name, "secs": round(time.time() - t0, 2)}
    if rows is not None:
        rec["rows"] = rows
    print("PHASE " + json.dumps(rec), file=sys.stderr, flush=True)
    return out
