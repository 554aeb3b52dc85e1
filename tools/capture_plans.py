"""Capture .explain("formatted") for every declared entry query into
plans/<tag>/<query>_<suffix>.txt (guide §1: record the plan shape --
Exchange count, join strategy, PushedFilters, Python eval nodes -- before
and after each optimization). Usage:
    python tools/capture_plans.py <tag> <suffix> [sf_dir] [only_query,...]
e.g. python tools/capture_plans.py r06 before /root/testdata/sf0.01
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r06"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None

    import __spark_entry__ as entry
    from dedup.session import get_spark

    spark = get_spark("capture-plans", master="local[8]", config=entry.CFG)
    spark.sparkContext.setLogLevel("ERROR")

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            txt = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR: {e}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        n_exch = txt.count("Exchange")
        n_py = (
            txt.count("BatchEvalPython")
            + txt.count("ArrowEvalPython")
            + txt.count("MapInArrow")
            + txt.count("FlatMapGroupsInPandas")
        )
        joins = {
            j: txt.count(j)
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
            if txt.count(j)
        }
        print(f"{name}: Exchange={n_exch} PyEval={n_py} joins={joins}")
    spark.stop()


if __name__ == "__main__":
    main()
