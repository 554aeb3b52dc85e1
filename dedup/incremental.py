"""Incremental re-dedup of appended conversations (SURVEY.md par.2.11):
new transcripts arrive, and instead of re-running the pipeline over the
full corpus, only (new x new) and (new x existing) candidate pairs are
generated -- the LSH band postings of the existing corpus are reused from
its checkpointed ``prepared`` stage table.

On Iceberg this consumes incremental snapshots; here the "append" is any
DataFrame of new transcripts. The same shape drives the Structured
Streaming wrapper (dedup/streaming.py) via foreachBatch.

Scale: the dominant cost of a naive re-run is re-sketching + re-joining
the full corpus; incremental touches the existing side only through ONE
band-key equi-join against the (small) new side -- broadcastable whenever
a micro-batch is small.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from dedup.config import DedupConfig, DEFAULT_CONFIG
from dedup.functions.sketch import band_hashes_udf
from dedup.operators.assemble import assemble_conversations
from dedup.operators.candidates import candidate_pairs, prepare_docs
from dedup.operators.verify import verify_pairs


@dataclass
class IncrementalResult:
    new_prepared: DataFrame       # sketches of the appended conversations
    verified_pairs: DataFrame     # new-new and new-old verified edges


def _bands(prepared: DataFrame, config: DedupConfig) -> DataFrame:
    return prepared.select(
        "doc_id",
        F.posexplode(band_hashes_udf("minhash", config)).alias("band_idx", "band_hash"),
    )


def incremental_dedup(
    new_transcripts: DataFrame,
    existing_prepared: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    broadcast_new: bool = True,
) -> IncrementalResult:
    """Dedup appended conversations against an existing prepared corpus.

    Returns the new side's prepared sketches (callers append them to the
    corpus table) and verified duplicate edges touching the new docs."""
    assembled = assemble_conversations(new_transcripts, config)
    new_prepared = prepare_docs(assembled, "conv_id", "doc_text", config)

    # new x new pairs: the ordinary LSH path on the (small) new side
    nn = candidate_pairs(new_prepared, config).pairs

    # new x existing pairs: one band-key equi-join; the new side's postings
    # broadcast when micro-batch-sized.
    new_bands = _bands(new_prepared, config)
    if broadcast_new:
        new_bands = F.broadcast(new_bands)
    old_bands = _bands(existing_prepared, config)
    no = (
        new_bands.select("band_idx", "band_hash", F.col("doc_id").alias("id_a"))
        .join(
            old_bands.select("band_idx", "band_hash", F.col("doc_id").alias("id_b")),
            ["band_idx", "band_hash"],
        )
        .filter(F.col("id_a") != F.col("id_b"))
        .select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    pairs = nn.unionByName(no).dropDuplicates(["id_a", "id_b"])
    both = new_prepared.unionByName(existing_prepared).dropDuplicates(["doc_id"])
    verified = verify_pairs(pairs, both, config)
    return IncrementalResult(new_prepared=new_prepared, verified_pairs=verified)
