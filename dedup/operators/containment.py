"""Long-span containment dedup: find conversations whose text is (nearly)
wholly embedded inside a longer conversation -- the case plain Jaccard LSH
structurally misses (containment of a short doc in a 5x longer one has set
Jaccard ~0.2, far below any sensible band threshold) and the deletion-ratio
length gate explicitly rejects.

Candidate generation: WINDOWED sketches. Long documents additionally emit
MinHash signatures for sliding windows over their gram sequence; a short
doc contained in a long one matches some window's signature with high
Jaccard, so its whole-doc bands collide with the window bands in the same
equi-join shape as the ordinary LSH path (same band hash function -> the
join key space is shared).

Verification ladder (containment-specific):
  1. exact containment score |A ∩ B| / |A| on gram-hash sets (native
     array_intersect), A = the shorter doc;
  2. for the uncertain band below the containment threshold, the
     longest-common-substring ratio via a suffix-automaton pandas UDF --
     the "suffix-array substring path" of BASELINE.json north_rule: a
     true containment has an LCS-substring covering ~all of the short doc
     even when stray edits depress the gram containment score.

Reference analog: none -- the reference matches whole titles only; this
tier is part of the transcript-scale extension (SURVEY.md par.2.9 tier 3+).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import DoubleType

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.functions.sketch import band_hashes_udf, minhash_signature_udf
from dedup.tracking import register


# ---------------------------------------------------------------------------
# suffix-automaton longest common substring (verification kernel)
# ---------------------------------------------------------------------------

def lcs_substring_len(a: str, b: str) -> int:
    """Longest common substring length via a suffix automaton of ``a``
    walked with ``b`` -- O(|a| + |b|) expected. Equivalent to (and used in
    place of) the classic generalized-suffix-array LCP scan."""
    if not a or not b:
        return 0
    # suffix automaton of a
    MAXN = 2 * len(a)
    nxt: list[dict[str, int]] = [dict() for _ in range(MAXN + 5)]
    link = [0] * (MAXN + 5)
    length = [0] * (MAXN + 5)
    last, size = 0, 1
    link[0] = -1
    for ch in a:
        cur = size
        size += 1
        length[cur] = length[last] + 1
        p = last
        while p != -1 and ch not in nxt[p]:
            nxt[p][ch] = cur
            p = link[p]
        if p == -1:
            link[cur] = 0
        else:
            q = nxt[p][ch]
            if length[p] + 1 == length[q]:
                link[cur] = q
            else:
                clone = size
                size += 1
                length[clone] = length[p] + 1
                nxt[clone] = dict(nxt[q])
                link[clone] = link[q]
                while p != -1 and nxt[p].get(ch) == q:
                    nxt[p][ch] = clone
                    p = link[p]
                link[q] = clone
                link[cur] = clone
        last = cur
    # walk b
    v, l, best = 0, 0, 0
    for ch in b:
        while v and ch not in nxt[v]:
            v = link[v]
            l = length[v]
        if ch in nxt[v]:
            v = nxt[v][ch]
            l += 1
            if l > best:
                best = l
    return best


def lcs_substring_ratio_udf(text_a: Column | str, text_b: Column | str) -> Column:
    """LCS-substring length / min(len_a, len_b) as an Arrow-batched UDF."""

    @F.pandas_udf(DoubleType())
    def _ratio(xs: pd.Series, ys: pd.Series) -> pd.Series:
        out = np.zeros(len(xs))
        for i, (a, b) in enumerate(zip(xs.fillna(""), ys.fillna(""))):
            m = min(len(a), len(b))
            out[i] = (lcs_substring_len(a, b) / m) if m else 0.0
        return pd.Series(out)

    ca = F.col(text_a) if isinstance(text_a, str) else text_a
    cb = F.col(text_b) if isinstance(text_b, str) else text_b
    # optimizer barrier (see similarity.levenshtein_ratio_pairs): keeps the
    # downstream lcs_ratio filter from dragging this UDF below the explicit
    # repartition() exchange into a near-serial pre-shuffle stage.
    return _ratio.asNondeterministic()(ca, cb)


# ---------------------------------------------------------------------------
# windowed-sketch candidate generation
# ---------------------------------------------------------------------------

def _window_slices(gram_hashes: Column, window: int, stride: int) -> Column:
    """array<array<bigint>>: sliding windows over the gram-hash sequence."""
    n = F.size(gram_hashes)
    n_win = F.greatest(F.ceil((n - F.lit(window)) / F.lit(stride)) + 1, F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_win.cast("int") - 1),
        lambda i: F.slice(gram_hashes, i * stride + 1, window),
    )


def containment_candidates(
    prepared: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    tracker: list[DataFrame] | None = None,
) -> DataFrame:
    """(id_short, id_long) candidates sharing a long contiguous gram span.

    EVERY doc is windowed uniformly (window W grams, stride W/2; docs
    shorter than W emit one whole-doc window), each window gets its own
    MinHash + band hashes, and windows meet in the same band equi-join as
    the ordinary LSH path. Geometry: a shared span of >= W grams guarantees
    some window pair aligned within W/4, i.e. set Jaccard >= ~0.6 -- well
    above the band-collision knee at this (b, r). Hot window bands (shared
    boilerplate spans) are capped by max_band_group exactly like the
    whole-doc path."""
    w, s = config.containment_window, config.containment_stride
    windows = prepared.select(
        F.col("doc_id").alias("id"),
        F.size("gram_hashes").alias("n_grams"),
        F.posexplode(_window_slices(F.col("gram_hashes"), w, s)).alias(
            "win_idx", "win_hashes"
        ),
    )
    bands = windows.select(
        "id",
        "n_grams",
        F.posexplode(
            band_hashes_udf(minhash_signature_udf("win_hashes", config), config)
        ).alias("band_idx", "band_hash"),
    ).persist()
    register(bands, tracker)
    sizes = bands.groupBy("band_idx", "band_hash").agg(
        F.count(F.lit(1)).alias("gsz")
    )
    postings = bands.join(
        sizes.filter((F.col("gsz") > 1) & (F.col("gsz") <= config.max_band_group)),
        ["band_idx", "band_hash"],
    )
    left = postings.select(
        "band_idx", "band_hash", "gsz", F.col("id").alias("id_a"), F.col("n_grams").alias("na")
    )
    right = postings.select(
        "band_idx", "band_hash", F.col("id").alias("id_b"), F.col("n_grams").alias("nb")
    )
    scored = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.when(F.col("na") <= F.col("nb"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("id_short"),
            F.when(F.col("na") <= F.col("nb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("id_long"),
            "gsz",
        )
        # band-hit counting replaces a plain dedup, but the noise filter is
        # CONDITIONAL on collision-group size: a pair whose best collision
        # happened in a quiet band group (gsz <= noise_group_size) is kept
        # even with a single hit -- it is cheap to verify and dropping it
        # would silently lose edit-diluted single-window containments. Only
        # pairs that exclusively collide inside big boilerplate groups must
        # clear containment_min_band_hits.
        .groupBy("id_short", "id_long")
        .agg(
            F.count(F.lit(1)).alias("band_hits"),
            F.min("gsz").alias("min_gsz"),
        )
        .filter(
            (F.col("band_hits") >= config.containment_min_band_hits)
            | (F.col("min_gsz") <= config.containment_noise_group_size)
        )
    )
    # RANKED PARTNER CAPS (config.containment_max_partners): a doc
    # colliding with hundreds of partners is shared boilerplate; verifying
    # every such pair ships the fat gram arrays ~|partners| times. Keep the
    # strongest-signal partners per short (band-hit rank, deterministic id
    # tiebreak), then bound the long side at 4x. True containments rank
    # top (aligned windows hit nearly every band); capped boilerplate
    # family edges remain reachable transitively through stronger edges.
    from dedup.operators.grouping import grouped_top_k

    cap = config.containment_max_partners
    capped = grouped_top_k(
        scored, ["id_short"], "band_hits", cap, tiebreak_cols=["id_long"]
    )
    capped = grouped_top_k(
        capped, ["id_long"], "band_hits", 4 * cap, tiebreak_cols=["id_short"]
    )
    return capped.select("id_short", "id_long")


def verify_containment(
    cands: DataFrame,
    prepared: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    tracker: list[DataFrame] | None = None,
) -> DataFrame:
    """-> (id_a, id_b, containment, lcs_ratio, tier='containment') edges,
    canonical id order. Containment = |short ∩ long| / |short| on gram-hash
    sets (native); LCS-substring UDF only for the uncertain band.

    THREE-PHASE (what rides the pair join dominates -- same lesson as
    verify.py): (0) a narrow (doc_id, n_grams) join drops too-short pairs
    before any array ships; (1) the gram-array join + intersection runs
    ONCE and is checkpointed as a SKINNY (ids, containment) table -- the
    sure/unsure branches must not each re-run the fat join, and the fat
    arrays must not be materialized into the checkpoint; (2) texts join
    only for the uncertain band that actually pays the LCS kernel."""
    thr = config.containment_threshold

    # phase 0: narrow length gate
    sizes = prepared.select("doc_id", F.size("gram_hashes").alias("n_grams"))
    cands = (
        cands.join(
            sizes.select(
                F.col("doc_id").alias("id_short"), F.col("n_grams").alias("n_s")
            ),
            "id_short",
        )
        .filter(F.col("n_s") >= config.containment_min_grams)
        .select("id_short", "id_long")
    )

    # phase 1: gram intersection, once, skinny output
    g = prepared.select("doc_id", "gram_hashes")
    scored = (
        cands.join(
            g.select(
                F.col("doc_id").alias("id_short"), F.col("gram_hashes").alias("gh_s")
            ).hint("shuffle_hash"),
            "id_short",
        )
        .join(
            g.select(
                F.col("doc_id").alias("id_long"), F.col("gram_hashes").alias("gh_l")
            ).hint("shuffle_hash"),
            "id_long",
        )
        .withColumn(
            "containment",
            F.size(F.array_intersect("gh_s", "gh_l")).cast("double")
            / F.size("gh_s").cast("double"),
        )
        .filter(F.col("containment") >= thr - 0.2)  # below both bands: dead
        .select("id_short", "id_long", "containment")
        .localCheckpoint()
    )
    register(scored, tracker)

    sure = scored.filter(F.col("containment") >= thr).withColumn(
        "lcs_ratio", F.lit(None).cast("double")
    )
    # phase 2 -- uncertain band: gram containment diluted by edits inside
    # the span; ask the substring kernel whether a long exact span still
    # exists. Texts join HERE, for this band only.
    t = prepared.select("doc_id", "norm_text")
    unsure = (
        scored.filter(F.col("containment") < thr)
        .join(
            t.select(
                F.col("doc_id").alias("id_short"), F.col("norm_text").alias("text_s")
            ).hint("shuffle_hash"),
            "id_short",
        )
        .join(
            t.select(
                F.col("doc_id").alias("id_long"), F.col("norm_text").alias("text_l")
            ).hint("shuffle_hash"),
            "id_long",
        )
        .repartition(config.lev_partitions)
        .withColumn("lcs_ratio", lcs_substring_ratio_udf("text_s", "text_l"))
        .filter(F.col("lcs_ratio") >= config.containment_lcs_ratio)
        .select("id_short", "id_long", "containment", "lcs_ratio")
    )
    out = sure.unionByName(unsure)
    return out.select(
        F.least("id_short", "id_long").alias("id_a"),
        F.greatest("id_short", "id_long").alias("id_b"),
        "containment",
        "lcs_ratio",
        F.lit("containment").alias("tier"),
    ).dropDuplicates(["id_a", "id_b"])
