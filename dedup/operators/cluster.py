"""Connected components via alternating large-star / small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond") -- the
clustering tier the reference lacks entirely (it stops at best-match pairs,
/root/reference/doppelspeller/predict.py:256-272; SURVEY.md par.2.9 tier 5').

Why star-contraction and not label propagation: min-label flooding needs
O(diameter) rounds (a 10k-node chain fixture = 10k shuffles); star rounds
converge in O(log^2 n) and each round is two groupBy/join shuffles.

Implementation is pure DataFrame ops -- per-node neighborhood minima via
``min().over()``-free groupBy+join (no collect_list: a 50k-leaf hub stays
(rows, not one giant array). Every iteration ends in ``localCheckpoint``
to truncate lineage (driver loops are where Spark plans otherwise grow
exponentially); on-cluster this is an Iceberg stage-table checkpoint.

Node ids are treated as orderable (string or long); canonical cluster id is
the component-minimum node id.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.tracking import register, release_blocks


def _uf_pairs(edge_iter) -> list[tuple]:
    """Union-find over an iterable of (a, b) pairs -> (node, root) rows for
    every non-root node, root = component-minimum id. Shared by the driver
    fast path and the partition-local pre-contraction."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_iter:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by id order => root is the minimum, canonical labels free
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(n, r) for n in parent if (r := find(n)) != n]


def _local_contract(edges: DataFrame) -> DataFrame:
    """Partition-LOCAL contraction (VERDICT r5 #1): run union-find over each
    partition's edge subset and emit only its spanning star edges
    (node -> partition-local component minimum). Connectivity-equivalent to
    the input -- every input edge's endpoints stay connected through the
    local roots -- with at most (#distinct nodes in partition) output rows.

    This is a NARROW pass (mapInPandas, no shuffle) that replaces the
    initial distinct(): exact-duplicate cliques, boilerplate hubs and
    duplicate edges all collapse before anything crosses the wire, so the
    star-contraction loop (each round ~6 small all-to-all shuffles whose
    cost on a real cluster is barrier/latency-shaped, not byte-shaped)
    starts from a far smaller edge set -- or is skipped entirely when the
    contracted count falls under cc_driver_threshold."""
    schema = edges.schema

    def contract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        srcs: list = []
        dsts: list = []
        for pdf in batches:
            srcs.append(pdf["src"])
            dsts.append(pdf["dst"])
        if not srcs:
            return
        rows = _uf_pairs(
            zip(pd.concat(srcs, ignore_index=True), pd.concat(dsts, ignore_index=True))
        )
        yield pd.DataFrame(rows, columns=["src", "dst"])

    return edges.mapInPandas(contract, schema)


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: m(u) = min over {u} ∪ N(u); emit (v, m(u)) for every
    neighbor v > u. Connects big neighbors to the local minimum."""
    sym = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionByName(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("min_n"))
    mins = mins.withColumn("m", F.least(F.col("u"), F.col("min_n"))).drop("min_n")
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges to (big, small); for each node u: m = min over
    {u} ∪ N_small(u); emit (v, m) for v in N_small(u) ∪ {u}, v != m."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    relabeled = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("src"), F.col("m").alias("dst"))
        .unionByName(mins.select(F.col("u").alias("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return relabeled


def _driver_union_find(edges: DataFrame) -> DataFrame:
    """Small-graph fast path: collect edges, union-find on the driver, one
    job in, one createDataFrame out. An LSH dedup graph is tiny relative to
    the corpus (edges ~ #duplicates), so even billion-doc runs often land
    here; the star-contraction path exists for when it doesn't.

    collect(), not toLocalIterator(): the caller already proved the edge
    set is under cc_driver_threshold (<= ~tens of MB), and toLocalIterator
    fetches each shuffle partition as its own round trip -- on the
    local-cluster probe topology those sequential fetches were most of the
    CC stage's 1->4-executor anti-scaling (r6)."""
    spark = edges.sparkSession
    star = _uf_pairs(
        (row["src"], row["dst"]) for row in edges.collect()
    )
    # _uf_pairs omits roots; cluster output must carry them too (every
    # root appears as some star row's dst, since singleton inputs are
    # impossible here -- edges have src != dst)
    roots = {r for _, r in star}
    rows = star + [(r, r) for r in roots]
    schema_type = edges.schema["src"].dataType.simpleString()
    # ship back through pandas: createDataFrame(list-of-tuples) pickles
    # row by row, the pandas path goes through one Arrow batch (r6)
    pdf = pd.DataFrame(rows, columns=["node", "cluster_id"])
    return spark.createDataFrame(
        pdf, f"node {schema_type}, cluster_id {schema_type}"
    )


def connected_components(
    edges: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    src: str = "id_a",
    dst: str = "id_b",
    tracker: list[DataFrame] | None = None,
) -> DataFrame:
    """Edge list -> (node, cluster_id) with cluster_id = min node id of the
    component. Nodes appearing only in ``edges``; callers union singleton
    docs afterwards (pipeline does).

    Hybrid strategy: edge sets under ``cc_driver_threshold`` take a
    driver-side union-find (one collect, no iteration -- a dedup edge set
    is O(#dups), usually tiny next to the corpus); larger graphs run the
    distributed large-star/small-star loop."""
    def _stats(df):
        # fixpoint probe: edge-set count + order-insensitive hash-sum of
        # the canonical pairs -- one tiny agg job per round.
        return df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.least("src", "dst"), F.greatest("src", "dst")).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
        ).first()

    # NARROW pre-contraction instead of a distinct() shuffle: per-partition
    # union-find collapses duplicate edges, exact-dup cliques and local hub
    # structure before anything crosses the wire, shrinking (often by
    # orders of magnitude) the edge set every subsequent round -- and the
    # initial count -- at zero shuffle cost (VERDICT r5 #1).
    e = (
        _local_contract(
            edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).filter(
                F.col("src") != F.col("dst")
            )
        )
        .localCheckpoint()
    )
    if config.cc_driver_threshold and e.count() <= config.cc_driver_threshold:
        out = _driver_union_find(e)
        # the union-find result is a fresh createDataFrame with no lineage
        # into `e` -- release the checkpoint blocks immediately
        release_blocks(e)
        return out
    prev = _stats(e)
    for _ in range(config.cc_max_iterations):
        # each star round ends in another narrow local contraction: the
        # round's output is connectivity-equivalent either way, and the
        # contraction keeps shrinking the set so the loop's small
        # all-to-all shuffles (latency-bound on many executors -- the
        # cluster-mode probe's one anti-scaling stage) touch fewer rows
        # and converge in fewer rounds.
        e2 = _local_contract(_small_star(_large_star(e))).localCheckpoint()
        # e2 is EAGER: the previous round's checkpoint blocks are no longer
        # reachable by anything -- free them now, or a 20-round convergence
        # holds 20 generations of the edge set in the block manager.
        release_blocks(e)
        cur = _stats(e2)
        e = e2
        if config.cc_driver_threshold and cur["n"] <= config.cc_driver_threshold:
            # the loop contracted the graph under the driver threshold:
            # finish with one union-find instead of more barrier rounds
            out = _driver_union_find(e)
            release_blocks(e)
            return out
        if cur["n"] == prev["n"] and cur["h"] == prev["h"]:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {config.cc_max_iterations} rounds"
        )

    # After convergence the returned frame still READS the final checkpoint:
    # register it for deferred release (pipeline drains after the clusters
    # table commits; trackerless callers drain at the next drain_tracked()).
    register(e, tracker)
    # After convergence the edges form stars (v -> component minimum).
    members = e.select(F.col("src").alias("node"), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias("node"), F.col("dst").alias("cluster_id"))
    return (
        members.unionByName(roots)
        .groupBy("node")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
