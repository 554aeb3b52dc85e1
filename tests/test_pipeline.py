"""End-to-end pipeline: dup-pair recall >= 0.99 + precision on planted
clusters; resume skips committed stages and reproduces identical clusters
(FIXTURES.md F1/F6)."""

import glob
import hashlib
import itertools
import shutil

import pyarrow.parquet as pq
import pytest

from dedup.generate import make_corpus
from dedup.pipeline import run_pipeline


def _pairs(df, id_col, cl_col):
    out = set()
    for _, grp in df.groupby(cl_col):
        ids = sorted(grp[id_col])
        out.update(itertools.combinations(ids, 2))
    return out


def _content_hashes(path):
    return [
        hashlib.md5(pq.read_table(f).to_pandas().to_csv().encode()).hexdigest()
        for f in sorted(glob.glob(f"{path}/part*.parquet"))
    ]


@pytest.fixture(scope="module")
def corpus():
    return make_corpus(n_conversations=150, seed=33)


def test_recall_and_precision(spark, config, corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    report = run_pipeline(spark, spark.createDataFrame(corpus.transcripts), wh, config)
    assert [s.table for s in report.stages] == [
        "assembled", "prepared", "exact_groups", "candidate_pairs",
        "verified_pairs", "containment_pairs", "clusters",
    ]
    clusters = spark.read.parquet(f"{wh}/clusters").toPandas()
    tp = _pairs(corpus.truth_clusters, "conv_id", "cluster_id")
    gp = _pairs(clusters, "conv_id", "cluster_id")
    recall = len(tp & gp) / max(len(tp), 1)
    precision = len(tp & gp) / max(len(gp), 1)
    assert recall >= 0.99, f"recall {recall}"
    assert precision >= 0.95, f"precision {precision}"
    # every conversation is assigned exactly one cluster
    assert len(clusters) == corpus.transcripts.conv_id.nunique()


def test_resume_mid_stage(spark, config, corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("whr"))
    tdf = spark.createDataFrame(corpus.transcripts)
    run_pipeline(spark, tdf, wh, config)
    before = _content_hashes(f"{wh}/clusters")

    # simulate a kill after candidate_pairs: later stages gone
    shutil.rmtree(f"{wh}/verified_pairs")
    shutil.rmtree(f"{wh}/clusters")
    report = run_pipeline(spark, tdf, wh, config)
    resumed = {s.table: s.resumed for s in report.stages}
    assert resumed["assembled"] and resumed["prepared"] and resumed["candidate_pairs"]
    assert not resumed["verified_pairs"] and not resumed["clusters"]
    assert _content_hashes(f"{wh}/clusters") == before

    # full second resume: everything skips
    report2 = run_pipeline(spark, tdf, wh, config)
    assert all(s.resumed for s in report2.stages)


def test_config_change_invalidates_checkpoints(spark, config, corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("whc"))
    tdf = spark.createDataFrame(corpus.transcripts.head(200))
    run_pipeline(spark, tdf, wh, config)
    other = config.with_(jaccard_threshold=0.9)
    report = run_pipeline(spark, tdf, wh, other)
    assert not any(s.resumed for s in report.stages)  # fingerprint mismatch


def test_pipeline_releases_all_cached_blocks(spark, config, corpus, tmp_path_factory):
    """After run_pipeline returns, NO cached/localCheckpointed RDD blocks
    may remain registered: a long-lived driver (bench loop, streaming,
    service) must not accumulate block-manager state across runs (r1 item 8
    / r2 verdict item 6). getPersistentRDDs is the source of truth for both
    .persist() and .localCheckpoint() blocks."""
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    # drop anything earlier module tests left behind so the assertion
    # isolates run_pipeline's own behavior
    for rdd_id in list(spark.sparkContext._jsc.getPersistentRDDs().keySet()):
        try:
            jsc.unpersistRDD(rdd_id, True)
        except Exception:
            pass
    wh = str(tmp_path_factory.mktemp("wh_blocks"))
    run_pipeline(spark, spark.createDataFrame(corpus.transcripts), wh, config)
    retained = dict(spark.sparkContext._jsc.getPersistentRDDs())
    assert not retained, f"leaked persistent RDDs: {retained}"
