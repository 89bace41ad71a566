"""Continuous corpus ingestion with cross-batch deduplication.

The pattern a training-data pipeline actually runs: documents arrive as
a stream (new crawl drops), and each micro-batch must be deduplicated
(a) within itself and (b) against EVERYTHING already ingested, then be
committed exactly-once to the versioned corpus table.

The against-corpus check never scans the corpus: a companion **hash
index table** holds one (content_hash, doc_id) row per ingested
document — 16-byte keys, no bodies — and each batch anti-joins its
hashes against it. At 100 TB of corpus the index is ~GBs and the
per-batch cost is O(batch + index-hash-join); the corpus itself is only
ever appended, never re-read.

Crash-safety: corpus and index appends can't be one atomic commit
(separate tables), so ordering decides the failure mode. The INDEX is
committed first: a crash between the two leaves hashes indexed whose
rows aren't in the corpus yet — future batches still drop those dups,
and replaying the batch (same tag) repairs the corpus: index rows carry
their batch tag, the anti-join excludes the replaying tag's own rows, so
the identical survivor set is recomputed, ``append_batch`` skips the
already-committed index append, and the missing corpus append lands. Corpus-first ordering would instead open a
window where another batch re-ingests duplicates. Duplicates never
enter; missing rows self-heal on replay.

Ref parity: beyond the reference (streaming ingestion extension; the
reference ingests via 3-hourly cron, ``dags/dag_bike.py:36``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_public_spark.sinks.table import ManifestTable


def _index_read(spark: SparkSession, index: ManifestTable) -> DataFrame | None:
    try:
        return index.read(spark)
    except FileNotFoundError:  # no version yet, or all-empty table
        return None


def ingest_batch_dedup(
    batch: DataFrame,
    corpus: ManifestTable,
    index: ManifestTable,
    batch_tag: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> int:
    """Ingest one batch: drop rows whose content hash is already in the
    index, dedup within the batch (min id per hash wins), then commit
    index-first with the same idempotence tag on both tables. Returns
    the batch's survivor count — 0 when every row was already ingested
    by OTHER batches; a replay recomputes the same positive count while
    both tagged appends no-op."""
    spark = batch.sparkSession
    hashed = batch.withColumn("content_hash", F.md5(F.col(text_col)))
    idx = _index_read(spark, index)
    if idx is not None:
        # exclude rows THIS tag committed: a replay after the crash
        # window (index committed, corpus not) must recompute the same
        # survivor set, not find its own hashes and emit nothing —
        # that's what lets corpus.append_batch below repair the corpus
        prior = idx.filter(F.col("batch_tag") != batch_tag)
        hashed = hashed.join(
            prior.select("content_hash"), "content_hash", "left_anti"
        )
    # within-batch: one survivor per hash, lowest id (deterministic —
    # a replayed batch reproduces the identical set)
    firsts = hashed.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    fresh = hashed.join(firsts, ["content_hash", id_col], "left_semi").persist()
    try:
        n_new = fresh.count()
        if n_new == 0:
            return 0
        index.append_batch(
            fresh.select(
                "content_hash", F.col(id_col), F.lit(batch_tag).alias("batch_tag")
            ),
            batch_tag,
        )
        corpus.append_batch(fresh.drop("content_hash"), batch_tag)
        return n_new
    finally:
        fresh.unpersist()


def ingest_dedup_stream(
    docs_stream: DataFrame,
    corpus_root: str,
    index_root: str,
    checkpoint: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    timeout_s: int = 300,
) -> ManifestTable:
    """Drain a document stream (availableNow) into a deduplicated
    versioned corpus. Each micro-batch runs ``ingest_batch_dedup`` with
    the batch id as the idempotence tag, so checkpoint replays and
    post-commit re-fires are both harmless."""
    from datalake_public_spark.streaming.runner import _await_or_raise

    corpus = ManifestTable(corpus_root)
    index = ManifestTable(index_root)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch_dedup(
            batch_df, corpus, index, f"b{batch_id:06d}",
            text_col=text_col, id_col=id_col,
        )

    q = (
        docs_stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    _await_or_raise(q, timeout_s, "ingest_dedup_stream")
    return corpus
