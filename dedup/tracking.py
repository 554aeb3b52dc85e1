"""Session-level block accounting for cached AND localCheckpointed frames.

Two release mechanisms exist in Spark and only one is commonly known:
``DataFrame.unpersist()`` drops cache-manager entries (``.persist()`` /
``.cache()`` frames) but is a NO-OP for ``localCheckpoint()`` frames --
their blocks are pinned at the RDD level under a ``LogicalRDD`` plan node
and survive any DataFrame-level unpersist. ``release_blocks`` below handles
both, so checkpoint barriers no longer leak block-manager memory for the
lifetime of the session (round-2 verdict: leaked checkpoint blocks starved
late bench queries ~4x).

Usage patterns:
  * pipeline stages thread an explicit ``tracker: list[DataFrame]`` and
    drain it (via ``release_blocks``) as each stage's output commits;
  * entry queries / the title cascade return LAZY frames and cannot drain
    in-query -- their intermediates are registered in the module-global
    registry via ``track``/``track_cache`` and the NEXT query (or an
    explicit ``drain_tracked()`` from a bench/driver loop) releases them.

CONTRACT: draining declares every previously returned DataFrame dead.
Re-evaluating a frame built on a released localCheckpoint RAISES (the
lineage was truncated; there is nothing to recompute from) -- drain only at
points where all prior results have been materialized, which is what the
sequential bench/correctness harnesses do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def release_blocks(df: DataFrame) -> None:
    """Free every block-manager resource a frame holds: cache-manager entry
    (persist/cache) and, for a localCheckpointed frame, the pinned RDD
    blocks beneath its LogicalRDD plan node."""
    try:
        df.unpersist()
    except Exception:
        return  # session already stopped
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getName().endswith(".LogicalRDD"):
            plan.rdd().unpersist(False)
    except Exception:
        pass  # not a checkpointed frame / plan shape changed across versions


def register(df: DataFrame, tracker: list[DataFrame] | None) -> DataFrame:
    """Operator-side registration: append to the caller's explicit tracker
    when one was threaded through, else to the session-global registry so
    trackerless call sites (entry queries, one-shot API use) still get
    drained at the next ``drain_tracked()`` instead of leaking."""
    if tracker is not None:
        tracker.append(df)
    else:
        _TRACKED.append(df)
    return df


def track(df: DataFrame) -> DataFrame:
    """Register an already-persisted/checkpointed frame globally."""
    _TRACKED.append(df)
    return df


def track_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register; the idiom for entry-query intermediates."""
    return track(df.cache())


def drain_tracked() -> None:
    """Release every globally tracked frame (see module contract)."""
    for df in _TRACKED:
        release_blocks(df)
    _TRACKED.clear()


def drain(tracker: list[DataFrame]) -> None:
    """Release and clear an explicit tracker list."""
    for df in tracker:
        release_blocks(df)
    tracker.clear()
