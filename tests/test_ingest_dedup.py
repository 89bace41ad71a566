"""Continuous corpus ingestion with cross-batch dedup: stream-vs-batch
equivalence, replay idempotence, and the index-first crash-window repair.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datalake_public_spark.sinks.table import ManifestTable
from datalake_public_spark.streaming.ingest_dedup import (
    ingest_batch_dedup,
    ingest_dedup_stream,
)

SCHEMA = "doc_id long, text string"


def _write_batches(spark, src):
    """Three arrival files: the second repeats half the first's texts,
    the third repeats one of its own rows and one corpus-wide text."""
    b1 = [(i, f"text number {i}") for i in range(10)]
    b2 = [(100 + i, f"text number {i}") for i in range(5)] + [
        (200 + i, f"fresh b2 {i}") for i in range(5)
    ]
    b3 = [(300, "fresh b3"), (301, "fresh b3"), (302, "text number 7")]
    for n, rows in enumerate([b1, b2, b3], 1):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/f{n}", mode="overwrite"
        )
    return b1, b2, b3


@pytest.fixture()
def tables(tmp_path):
    return (
        ManifestTable(str(tmp_path / "corpus")),
        ManifestTable(str(tmp_path / "index")),
    )


def test_stream_ingest_equals_batch_exact_dedup(spark, tmp_path, tables):
    src = str(tmp_path / "src")
    b1, b2, b3 = _write_batches(spark, src)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)  # force one micro-batch per file
        .parquet(f"{src}/f*")
    )
    corpus = ingest_dedup_stream(
        stream,
        str(tmp_path / "corpus"),
        str(tmp_path / "index"),
        str(tmp_path / "ckpt"),
    )
    got = {(r.doc_id, r.text) for r in corpus.read(spark).collect()}
    # batch oracle: min doc_id per distinct text over the whole input
    full = spark.createDataFrame(b1 + b2 + b3, SCHEMA)
    want = {
        (r.doc_id, r.text)
        for r in full.groupBy("text").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    assert got == want
    assert len(got) == 16  # 10 + 5 fresh + 1 fresh (b3 self-dup collapsed)


def test_fully_duplicate_batch_commits_nothing(spark, tables):
    corpus, index = tables
    b = spark.createDataFrame([(1, "only text")], SCHEMA)
    assert ingest_batch_dedup(b, corpus, index, "b1") == 1
    v = corpus.current_version()
    dup = spark.createDataFrame([(2, "only text")], SCHEMA)
    assert ingest_batch_dedup(dup, corpus, index, "b2") == 0
    assert corpus.current_version() == v


def test_replay_same_tag_is_idempotent(spark, tables):
    corpus, index = tables
    b = spark.createDataFrame([(1, "a"), (2, "b")], SCHEMA)
    ingest_batch_dedup(b, corpus, index, "b1")
    cv, iv = corpus.current_version(), index.current_version()
    # replay recomputes the survivors but both tagged appends no-op
    assert ingest_batch_dedup(b, corpus, index, "b1") == 2
    assert (corpus.current_version(), index.current_version()) == (cv, iv)
    assert corpus.read(spark).count() == 2


def test_crash_window_index_committed_corpus_missing_self_heals(spark, tables):
    corpus, index = tables
    b = spark.createDataFrame([(1, "x"), (2, "y")], SCHEMA)
    # simulate the crash: index append landed, corpus append did not
    index.append_batch(
        b.select(
            F.md5("text").alias("content_hash"),
            "doc_id",
            F.lit("b1").alias("batch_tag"),
        ),
        "b1",
    )
    assert corpus.current_version() is None
    # replay of the same batch repairs the corpus, index untouched
    iv = index.current_version()
    assert ingest_batch_dedup(b, corpus, index, "b1") == 2
    assert corpus.read(spark).count() == 2
    assert index.current_version() == iv
    # and duplicates still can't enter afterwards
    dup = spark.createDataFrame([(9, "x")], SCHEMA)
    assert ingest_batch_dedup(dup, corpus, index, "b2") == 0


def test_index_stays_narrow(spark, tables):
    corpus, index = tables
    b = spark.createDataFrame([(1, "wide " * 1000)], SCHEMA)
    ingest_batch_dedup(b, corpus, index, "b1")
    assert set(index.read(spark).columns) == {"content_hash", "doc_id", "batch_tag"}


# -- near-dup ingestion ----------------------------------------------------


def _near_tables(tmp_path):
    from datalake_public_spark.sinks.table import ManifestTable

    return (
        ManifestTable(str(tmp_path / "corpus")),
        ManifestTable(str(tmp_path / "eidx")),
        ManifestTable(str(tmp_path / "sidx")),
    )


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from every single hunter nearby"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from every single hunter today"
)
OTHER = (
    "completely different content about spark shuffles partitions and "
    "catalyst optimizer rules with nothing shared at all between corpora"
)


def test_neardedup_within_batch_keeps_min_of_cluster(spark, tmp_path):
    from datalake_public_spark.streaming.ingest_dedup import ingest_batch_neardedup

    corpus, eidx, sidx = _near_tables(tmp_path)
    b = spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, OTHER)], SCHEMA
    )
    n = ingest_batch_neardedup(b, corpus, eidx, sidx, "b1")
    assert n == 2
    kept = {r.doc_id for r in corpus.read(spark).collect()}
    assert kept == {1, 3}  # near-pair (1,2) collapsed to min id


def test_neardedup_across_batches_via_signature_index(spark, tmp_path):
    from datalake_public_spark.streaming.ingest_dedup import ingest_batch_neardedup

    corpus, eidx, sidx = _near_tables(tmp_path)
    assert ingest_batch_neardedup(
        spark.createDataFrame([(1, BASE)], SCHEMA), corpus, eidx, sidx, "b1"
    ) == 1
    # the near-variant arrives in a LATER batch: caught by the sig index
    assert ingest_batch_neardedup(
        spark.createDataFrame([(10, NEAR), (11, OTHER)], SCHEMA),
        corpus, eidx, sidx, "b2",
    ) == 1
    kept = {r.doc_id for r in corpus.read(spark).collect()}
    assert kept == {1, 11}
    # exact dup across batches still caught by the exact index
    assert ingest_batch_neardedup(
        spark.createDataFrame([(20, OTHER)], SCHEMA), corpus, eidx, sidx, "b3"
    ) == 0


def test_neardedup_replay_is_idempotent_and_heals(spark, tmp_path):
    from datalake_public_spark.streaming.ingest_dedup import ingest_batch_neardedup

    corpus, eidx, sidx = _near_tables(tmp_path)
    b = spark.createDataFrame([(1, BASE), (2, OTHER)], SCHEMA)
    assert ingest_batch_neardedup(b, corpus, eidx, sidx, "b1") == 2
    vs = (corpus.current_version(), eidx.current_version(), sidx.current_version())
    assert ingest_batch_neardedup(b, corpus, eidx, sidx, "b1") == 2
    assert (
        corpus.current_version(), eidx.current_version(), sidx.current_version()
    ) == vs
    assert corpus.read(spark).count() == 2


def test_neardedup_stream_end_to_end(spark, tmp_path):
    from datalake_public_spark.streaming.ingest_dedup import ingest_neardedup_stream

    src = str(tmp_path / "src")
    f1 = [(1, BASE), (2, OTHER)]
    f2 = [(10, NEAR), (11, BASE), (12, "yet more standalone content here "
                                       "with its own vocabulary entirely")]
    for n, rows in ((1, f1), (2, f2)):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{src}/f{n}", mode="overwrite"
        )
    corpus = ingest_neardedup_stream(
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*"),
        str(tmp_path / "c"), str(tmp_path / "e"), str(tmp_path / "s"),
        str(tmp_path / "ckpt"),
    )
    kept = {r.doc_id for r in corpus.read(spark).collect()}
    # 10 is a near-dup of 1, 11 an exact dup of 1 — both dropped
    assert kept == {1, 2, 12}


def test_neardedup_batch_leaves_no_lingering_caches(spark, tmp_path):
    """Per-micro-batch calls must not accumulate cached partitions on
    executors across a long stream (ADVICE r3): the batch releases the
    LSH signature cache and its own persists before returning."""
    from datalake_public_spark.streaming.ingest_dedup import (
        ingest_batch_neardedup,
    )

    corpus = ManifestTable(str(tmp_path / "c"))
    eidx = ManifestTable(str(tmp_path / "e"))
    sidx = ManifestTable(str(tmp_path / "s"))
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for b in range(2):
        batch = spark.createDataFrame(
            [(b * 10 + i, f"doc body {b} {i}") for i in range(6)], SCHEMA
        )
        ingest_batch_neardedup(batch, corpus, eidx, sidx, f"t{b}")
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after <= before
    assert corpus.read(spark).count() == 12
    # The release path resolved on every call — a nonzero counter means
    # private-API drift silently reinstated the leak (ADVICE r4).
    from datalake_public_spark.operators import iterutils

    assert iterutils.release_failures == 0


def test_release_checkpoint_failure_is_counted_not_swallowed(spark):
    """Calling release on a frame that is NOT a localCheckpoint (so the
    JVM plan node has no rdd()) must increment the drift counter and
    warn once — not silently no-op (ADVICE r4). The happy path in the
    iterative suites keeps the counter at 0."""
    import warnings

    from datalake_public_spark.operators import iterutils

    plain = spark.range(3).selectExpr("id", "id * 2 AS two")
    before = iterutils.release_failures
    with warnings.catch_warnings(record=True):
        warnings.simplefilter("always")
        iterutils.release_local_checkpoint(plain)
    assert iterutils.release_failures == before + 1
    # reset so later suites' zero-failure assertions see a clean slate
    iterutils.release_failures = before
