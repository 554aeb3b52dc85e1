"""Attribute the candidate_pairs stage's flat (core-count-invariant) wall
time: time each sub-part of the stage separately -- band-group build,
family collapse, pair fan-out + per-pair aggregate -- at two parallelism
levels on the same prepared checkpoint, and report raw pair volume.

The r5 campaign shows the stage running ~40-46s at BOTH local[4] and
local[16] on 64k convs (efficiency ~0.29) while the v3 single run posted
19.3s at local[16]: something in the job is bound by a shared resource or
a serial step, and the stage-level number cannot say which. This probe
answers it without Spark UI access.

Usage: python tools/probe_candidates.py [convs=64000] [cpus=16]
Reuses bench.py's corpus cache + a persistent warehouse at
/tmp/probe_cand_wh_<convs> (pipeline resume makes repeat runs cheap).
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    convs = int(sys.argv[1]) if len(sys.argv) > 1 else 64000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import hashlib

    import pyspark.sql.functions as F

    from dedup.config import DedupConfig
    from dedup.operators.candidates import pair_structs
    from dedup.functions.sketch import band_hashes_col
    from dedup.session import get_spark

    cfg = DedupConfig(shuffle_partitions=cpus * 2, conv_partitions=cpus * 2)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{3 * cpus}g")
    spark = get_spark("probe_cand", master=f"local[{cpus}]", config=cfg)
    spark.sparkContext.setLogLevel("ERROR")

    # corpus via bench cache; prepared via resumable pipeline warehouse
    gen_ver = hashlib.sha256(
        open(os.path.join(ROOT, "dedup", "generate.py"), "rb").read()
    ).hexdigest()[:10]
    corpus_path = os.path.join(
        "/tmp/spark_graft_corpus_cache", f"gen_{gen_ver}", f"transcripts_c{convs}_s42"
    )
    wh = f"/tmp/probe_cand_wh_{convs}"
    if not os.path.exists(os.path.join(wh, "prepared", "_MANIFEST.json")):
        from dedup.pipeline import run_pipeline
        from dedup.config import DedupConfig as DC

        tdf = spark.read.parquet(corpus_path)
        # containment off: we only need through the candidate stage
        run_pipeline(spark, tdf, wh, cfg.with_(containment_enabled=False))
    prepared = spark.read.parquet(os.path.join(wh, "prepared"))
    reps = prepared  # exact-group collapse barely changes volume for timing

    out: dict = {"convs": convs, "cpus": cpus}

    def timed(name, fn):
        t0 = time.time()
        r = fn()
        out[name] = round(time.time() - t0, 2)
        print(f"{name}: {out[name]}s", flush=True)
        return r

    bands = reps.select(
        "doc_id",
        F.posexplode(band_hashes_col("minhash", cfg)).alias("band_idx", "band_hash"),
    )
    groups = (
        bands.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .withColumn("gsz", F.size("ids"))
        .filter(F.col("gsz") > 1)
        .persist()
    )
    out["n_groups"] = timed("t_groups_build", lambda: groups.count())

    ok = groups.filter(F.col("gsz") <= cfg.max_band_group)
    fam = ok.groupBy("ids").agg(
        F.count(F.lit(1)).alias("n_bands"), F.min("gsz").alias("gsz")
    ).persist()
    out["n_families"] = timed("t_family_groupby", lambda: fam.count())

    cool = fam.filter(F.col("gsz") <= cfg.salt_hot_threshold)
    raw_pairs = cool.select(
        "gsz", "n_bands", F.explode(pair_structs(F.col("ids"))).alias("p")
    )
    out["n_raw_cool_pairs"] = timed("t_cool_fanout", lambda: raw_pairs.count())

    agg = (
        raw_pairs.select(
            F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"),
            "gsz", "n_bands",
        )
        .groupBy("id_a", "id_b")
        .agg(F.sum("n_bands").alias("band_hits"), F.min("gsz").alias("min_gsz"))
        .filter(
            (F.col("band_hits") >= cfg.lsh_min_band_hits)
            | (F.col("min_gsz") <= cfg.lsh_noise_group_size)
        )
    )
    out["n_pairs_final"] = timed("t_pair_agg", lambda: agg.count())

    groups.unpersist(); fam.unpersist()
    print(json.dumps(out))
    path = os.path.join(ROOT, "artifacts", f"probe_candidates_{convs}_c{cpus}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
