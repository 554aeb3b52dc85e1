"""Sub-phase attribution probe for the two non-scaling pipeline stages
(verified_pairs, containment_pairs -- BENCH_SCALING stage table). Runs the
bench corpus through prepare + candidates once, then times each internal
phase of verify_pairs / containment separately so the non-scaling component
is identified empirically.

Usage: python tools/probe_verify.py <cpus> [convs]
Prints one JSON line of phase timings.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")


def main():
    cpus = int(sys.argv[1])
    convs = int(sys.argv[2]) if len(sys.argv) > 2 else 8000

    import pyspark.sql.functions as F

    from dedup.config import DedupConfig
    from dedup.functions.similarity import (
        bag_l1_col,
        char_count_vector_udf,
        exact_jaccard_col,
        minhash_estimate_col,
        staged_levenshtein_ratio_col,
    )
    from dedup.functions.sketch import hamming_col
    from dedup.generate import make_corpus
    from dedup.operators.assemble import assemble_conversations
    from dedup.operators.candidates import candidate_pairs, prepare_docs
    from dedup.operators.verify import _two_sided, jaccard_gate_threshold
    from dedup.session import get_spark

    # FIXED partitioning at both levels: vary only the thread count
    config = DedupConfig(shuffle_partitions=64, conv_partitions=64)
    spark = get_spark("probe-verify", master=f"local[{cpus}]", config=config)
    spark.sparkContext.setLogLevel("ERROR")
    t = {}

    def lap(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", file=sys.stderr)
        return out

    corpus = make_corpus(n_conversations=convs, seed=42)
    tdf = spark.createDataFrame(corpus.transcripts)

    prepared = lap(
        "prepare",
        lambda: prepare_docs(
            assemble_conversations(tdf, config), "conv_id", "doc_text", config
        ).localCheckpoint(),
    )
    t["n_docs"] = prepared.count()

    res = candidate_pairs(prepared, config)
    pairs = lap("candidates", lambda: res.pairs.localCheckpoint())
    t["n_cand_pairs"] = pairs.count()

    # ---- verify sub-phases (mirrors verify_pairs) ----
    thr = config.lev_threshold
    pairs_rp = pairs.repartition(config.shuffle_partitions, "id_a", "id_b")
    light = lap(
        "v_light_ccv",
        lambda: prepared.select(
            "doc_id",
            "minhash",
            "simhash",
            F.length("norm_text").alias("n_chars"),
            char_count_vector_udf("norm_text").alias("ccv"),
        ).localCheckpoint(),
    )
    la, lb = _two_sided(
        light, {"mh": "minhash", "sim": "simhash", "len": "n_chars", "ccv": "ccv"}
    )
    total_len = F.col("len_a") + F.col("len_b")
    p1_expr = (
        pairs_rp.join(la, "id_a")
        .join(lb, "id_b")
        .withColumn("est", minhash_estimate_col("mh_a", "mh_b"))
        .withColumn("hamming", hamming_col("sim_a", "sim_b"))
        .withColumn(
            "del_ratio",
            F.when(total_len == 0, F.lit(100.0)).otherwise(
                (total_len - F.abs(F.col("len_a") - F.col("len_b"))) / total_len * 100.0
            ),
        )
        .withColumn(
            "bag_ok",
            bag_l1_col("ccv_a", "ccv_b") <= total_len * F.lit(1.0 - thr / 100.0),
        )
        .select("id_a", "id_b", "est", "hamming", "del_ratio", "bag_ok")
    )
    gate = jaccard_gate_threshold(config)
    sim_ok = F.col("hamming") <= F.lit(config.simhash_hamming_threshold)
    p1 = lap(
        "v_p1_sketchjoin",
        lambda: p1_expr.filter(
            (F.col("est") >= F.lit(gate))
            | sim_ok
            | ((F.col("del_ratio") >= F.lit(float(thr))) & F.col("bag_ok"))
        ).localCheckpoint(),
    )
    t["n_p1"] = p1.count()

    ga, gb = _two_sided(prepared.select("doc_id", "gram_hashes"), {"gh": "gram_hashes"})
    jac = (
        p1.filter(F.col("est") >= F.lit(gate))
        .join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("jaccard", exact_jaccard_col("gh_a", "gh_b"))
        .select("id_a", "id_b", "jaccard")
    )
    scored = lap(
        "v_p2a_exactjac",
        lambda: p1.join(jac, ["id_a", "id_b"], "left")
        .withColumn("jaccard", F.coalesce("jaccard", F.lit(0.0)))
        .localCheckpoint(),
    )
    jac_ok = F.col("jaccard") >= F.lit(config.jaccard_threshold)
    del_ok = F.col("del_ratio") >= F.lit(float(thr))
    need_lev = scored.filter(
        ~jac_ok
        & ~sim_ok
        & del_ok
        & F.col("bag_ok")
        & (F.col("est") >= F.lit(config.lev_est_gate))
    ).select("id_a", "id_b", "jaccard", "hamming")
    t["n_need_lev"] = need_lev.count()
    ta, tb = _two_sided(prepared.select("doc_id", "norm_text"), {"text": "norm_text"})
    lev = (
        need_lev.join(ta, "id_a")
        .join(tb, "id_b")
        .repartition(config.lev_partitions)
        .withColumn("lev_ratio", staged_levenshtein_ratio_col("text_a", "text_b", config))
        .filter(F.col("lev_ratio") > F.lit(thr))
    )
    t["n_lev_pass"] = lap("v_p2b_levdp", lambda: lev.count())

    # ---- containment sub-phases ----
    from dedup.operators.containment import (
        _window_slices,
        lcs_substring_ratio_udf,
    )
    from dedup.functions.sketch import band_hashes_col, minhash_signature_udf

    w, s = config.containment_window, config.containment_stride
    windows = prepared.select(
        F.col("doc_id").alias("id"),
        F.size("gram_hashes").alias("n_grams"),
        F.posexplode(_window_slices(F.col("gram_hashes"), w, s)).alias(
            "win_idx", "win_hashes"
        ),
    )
    bands = lap(
        "c_window_sketch",
        lambda: windows.select(
            "id",
            "n_grams",
            F.posexplode(
                band_hashes_col(
                    minhash_signature_udf(
                        "win_hashes", config, num_perm=config.containment_num_perm
                    ),
                    config,
                    bands=config.containment_lsh_bands,
                    rows=config.containment_lsh_rows,
                )
            ).alias("band_idx", "band_hash"),
        ).localCheckpoint(),
    )
    t["n_win_bands"] = bands.count()
    sizes = bands.groupBy("band_idx", "band_hash").agg(F.count(F.lit(1)).alias("gsz"))
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
    cpairs = lap(
        "c_band_join",
        lambda: left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.when(F.col("na") <= F.col("nb"), F.col("id_a")).otherwise(F.col("id_b")).alias("id_short"),
            F.when(F.col("na") <= F.col("nb"), F.col("id_b")).otherwise(F.col("id_a")).alias("id_long"),
            "gsz",
        )
        .groupBy("id_short", "id_long")
        .agg(F.count(F.lit(1)).alias("band_hits"), F.min("gsz").alias("min_gsz"))
        .filter(
            (F.col("band_hits") >= config.containment_min_band_hits)
            | (F.col("min_gsz") <= config.containment_noise_group_size)
        )
        .select("id_short", "id_long")
        .localCheckpoint(),
    )
    t["n_cont_cands"] = cpairs.count()

    szs = prepared.select("doc_id", F.size("gram_hashes").alias("n_grams"))
    cands2 = (
        cpairs.join(
            szs.select(F.col("doc_id").alias("id_short"), F.col("n_grams").alias("n_s")),
            "id_short",
        )
        .filter(F.col("n_s") >= config.containment_min_grams)
        .select("id_short", "id_long")
    )
    g = prepared.select("doc_id", "gram_hashes")
    thr_c = config.containment_threshold
    scored_c = lap(
        "c_gram_intersect",
        lambda: cands2.join(
            g.select(F.col("doc_id").alias("id_short"), F.col("gram_hashes").alias("gh_s")),
            "id_short",
        )
        .join(
            g.select(F.col("doc_id").alias("id_long"), F.col("gram_hashes").alias("gh_l")),
            "id_long",
        )
        .withColumn(
            "containment",
            F.size(F.array_intersect("gh_s", "gh_l")).cast("double")
            / F.size("gh_s").cast("double"),
        )
        .filter(F.col("containment") >= thr_c - 0.2)
        .select("id_short", "id_long", "containment")
        .localCheckpoint(),
    )
    t["n_cont_scored"] = scored_c.count()
    tt = prepared.select("doc_id", "norm_text")
    unsure = (
        scored_c.filter(F.col("containment") < thr_c)
        .join(tt.select(F.col("doc_id").alias("id_short"), F.col("norm_text").alias("text_s")), "id_short")
        .join(tt.select(F.col("doc_id").alias("id_long"), F.col("norm_text").alias("text_l")), "id_long")
        .repartition(config.lev_partitions)
        .withColumn("lcs_ratio", lcs_substring_ratio_udf("text_s", "text_l"))
        .filter(F.col("lcs_ratio") >= config.containment_lcs_ratio)
    )
    t["n_cont_lcs_pass"] = lap("c_lcs_udf", lambda: unsure.count())

    t["cpus"] = cpus
    t["convs"] = convs
    print(json.dumps(t))
    spark.stop()


if __name__ == "__main__":
    main()
