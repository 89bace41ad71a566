"""Events-reader encoding adaptivity + conf-scoping regressions.

Driver testdata has shipped the events ``ts`` column as TIMESTAMP(NANOS)
and as timestamp[us] across rounds (NOTES_r1); ADVICE r1 flagged that (a)
only whichever encoding the current generator emits was tested, (b) a
tz-adjusted timestamp[us, tz=UTC] file would break the streaming schema,
and (c) ``nanosAsLong`` leaked into the session. This module writes the
SAME rows in all three encodings and asserts batch and streaming readers
agree — and that no session conf survives any read.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datalake_public_spark.driver_queries import _NANOS_CONF, _events, _events_ts_meta
from datalake_public_spark.streaming.runner import run_available_now
from datalake_public_spark.streaming.sources import events_stream

# instants with sub-microsecond nanos (truncation must match DuckDB's)
_NS = [1700000000123456789, 1700000001987654321, 1700003600000000000]
_ROWS = {
    "event_id": [1, 2, 3],
    "user_id": [10, 11, 10],
    "event_type": ["click", "view", "click"],
    "value": [1.5, 2.5, 3.5],
    "props": ['{"k":1}', '{"k":2}', None],
}


def _write(dirpath: str, ts_array: pa.Array) -> str:
    os.makedirs(dirpath, exist_ok=True)
    t = pa.table({"event_id": _ROWS["event_id"], "ts": ts_array, **{
        k: v for k, v in _ROWS.items() if k != "event_id"
    }})
    pq.write_table(t, os.path.join(dirpath, "events.parquet"))
    return dirpath


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("enc")
    ns_dir = _write(str(base / "ns"), pa.array(_NS, type=pa.timestamp("ns")))
    us = [v // 1000 for v in _NS]
    us_dir = _write(str(base / "us"), pa.array(us, type=pa.timestamp("us")))
    utc_dir = _write(
        str(base / "us_utc"), pa.array(us, type=pa.timestamp("us", tz="UTC"))
    )
    return {"ns": ns_dir, "us": us_dir, "us_utc": utc_dir}


def test_ts_meta_probe(encoded_dirs):
    assert _events_ts_meta(encoded_dirs["ns"] + "/events.parquet") == ("ns", None)
    assert _events_ts_meta(encoded_dirs["us"] + "/events.parquet") == ("us", None)
    assert _events_ts_meta(encoded_dirs["us_utc"] + "/events.parquet") == ("us", "UTC")


def test_ts_meta_int64_maps_to_nanos_branch(tmp_path):
    d = _write(str(tmp_path), pa.array(_NS, type=pa.int64()))
    assert _events_ts_meta(d + "/events.parquet") == ("ns", None)


def test_ts_meta_rejects_unsupported_type(tmp_path):
    d = _write(str(tmp_path), pa.array(["a", "b", "c"]))
    with pytest.raises(TypeError, match="unsupported parquet type"):
        _events_ts_meta(d + "/events.parquet")


@pytest.mark.parametrize("enc", ["ns", "us", "us_utc"])
def test_batch_rows_identical_across_encodings(spark, encoded_dirs, enc):
    rows = sorted(
        (r.event_id, r.ts, r.user_id, r.event_type)
        for r in _events(spark, encoded_dirs[enc]).collect()
    )
    ref = sorted(
        (r.event_id, r.ts, r.user_id, r.event_type)
        for r in _events(spark, encoded_dirs["us"]).collect()
    )
    assert rows == ref
    # dtype contract: always session-tz TIMESTAMP after the reader
    assert dict(_events(spark, encoded_dirs[enc]).dtypes)["ts"] == "timestamp"


@pytest.mark.parametrize("enc", ["ns", "us", "us_utc"])
def test_stream_equals_batch_for_every_encoding(spark, encoded_dirs, enc):
    batch = sorted(
        (r.event_id, r.ts, r.value) for r in _events(spark, encoded_dirs[enc]).collect()
    )
    streamed = run_available_now(
        events_stream(spark, encoded_dirs[enc]), output_mode="append"
    )
    got = sorted((r.event_id, r.ts, r.value) for r in streamed.collect())
    assert got == batch


def test_nanos_conf_never_leaks(spark, encoded_dirs):
    """After batch AND streaming nanos reads, the session conf must be
    back to unset — a later plain read of a nanos file must still fail
    (proving behavior for other readers is unchanged), and a plain
    micros read is unaffected."""
    spark.conf.unset(_NANOS_CONF)  # clean slate regardless of test order
    _events(spark, encoded_dirs["ns"]).collect()
    assert spark.conf.get(_NANOS_CONF, None) in (None, "false")
    run_available_now(events_stream(spark, encoded_dirs["ns"]), output_mode="append")
    assert spark.conf.get(_NANOS_CONF, None) in (None, "false")
    # unchanged default behavior for an unsuspecting later reader
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL|Illegal Parquet type"):
        spark.read.parquet(encoded_dirs["ns"] + "/events.parquet").collect()
    assert spark.read.parquet(encoded_dirs["us"] + "/events.parquet").count() == 3


def test_scoped_conf_ownership_and_chain(spark):
    """ADVICE r2: restore must touch only the calling thread's entries,
    and same-key entries must collapse as a chain — another runner's
    restore can no longer unset a conf a pending query still needs."""
    import threading

    from datalake_public_spark.streaming import sources as S

    key = "spark.sql.legacy.parquet.nanosAsLong"
    assert spark.conf.get(key, None) is None

    # thread B pushes the same conf; A's restore must not unset it
    S._set_query_scoped_conf(spark, key, "true")  # A (this thread)
    done = threading.Event()

    def push_b():
        S._set_query_scoped_conf(spark, key, "true")
        done.set()

    t = threading.Thread(target=push_b)
    t.start()
    done.wait()
    t.join()

    S.restore_query_scoped_confs(spark)  # A restores: only its own entry
    assert spark.conf.get(key, None) == "true", "B's pending conf was clobbered"
    # B's entry inherited A's prev via the chain collapse; restoring it
    # from B's thread returns the conf to the original (unset) state
    restored = threading.Event()

    def restore_b():
        S.restore_query_scoped_confs(spark)
        restored.set()

    t2 = threading.Thread(target=restore_b)
    t2.start()
    restored.wait()
    t2.join()
    assert spark.conf.get(key, None) is None
    assert S._PENDING_CONF_RESTORE == []


def test_scoped_conf_random_interleavings(spark):
    """Randomized stress of the push/restore chain: any interleaving of
    pushes and per-thread restores across 3 threads must (a) never unset
    the conf while another thread still has a pending entry, and (b)
    restore the ORIGINAL value once the last entry is released."""
    import random
    import threading

    from datalake_public_spark.streaming import sources as S

    key = "spark.sql.legacy.parquet.nanosAsLong"
    assert spark.conf.get(key, None) is None

    for seed in range(8):
        rng = random.Random(seed)
        n_threads = 3
        barrier = threading.Barrier(n_threads)
        errors = []

        def worker():
            try:
                barrier.wait()
                for _ in range(rng.randint(1, 3)):
                    S._set_query_scoped_conf(spark, key, "true")
                    # while THIS thread holds a pending entry, the conf
                    # must be set
                    assert spark.conf.get(key, None) == "true"
                S.restore_query_scoped_confs(spark)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker) for _ in range(n_threads)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        assert S._PENDING_CONF_RESTORE == [], seed
        assert spark.conf.get(key, None) is None, seed
