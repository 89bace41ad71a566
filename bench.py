"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "reps": R, "bucketed": {...}}

Each query is forced through a noop sink (full materialization — count()
would let Catalyst prune the very columns being benchmarked). Session uses
the same engine profile as production (session.py): AQE on, UTC, Arrow on.

Protocol (round-3): every query runs $SPARK_GRAFT_BENCH_REPS times
(default 3, rep-major order) and reports the per-query MIN — host-load
variance on this box is ~3× (NOTES_r1/r2), so a single sample is noise;
the min is the reproducible number. `value` = sum of per-query mins.
`bucketed` reports q3/q5 over the co-bucketed fact layout
(sinks/bucketing.py; materialization untimed — it is paid once at ingest)
next to their scan-based twins, NOT counted in `value` so totals stay
comparable across rounds.

Round 14 (VERDICT r13 item 5): three rows the optimizer actually works
on — text_stats, decontaminate_train_split, similarity_topk — join the
reported set as ADDITIONS (the 13 original rows are untouched);
`value_r13_comparable` / `value_r7_comparable` exclude them so every
older total series reads unbroken. Operator-adopted caches are released
between reps so the published min never measures a cache hit.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datalake_public_spark import EngineConfig, get_spark
from datalake_public_spark.driver_queries import REGISTRY
from datalake_public_spark.driver_queries_llm import LLM_REGISTRY
from datalake_public_spark.driver_registry import FINAL_REGISTRY

# The headline set: every engine surface (scan-agg, star join, window,
# sessionize, dedup exact/LSH, text analysis, fingerprint, ANN, streaming-
# shaped window agg) — the queries a 100 TB deployment runs daily.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_regional_revenue",
    "q6_revenue_forecast",
    "window_topk",
    "sessionize",
    "tumbling_window_agg",
    "dedup_exact",
    "dedup_lines",
    "bm25_topk",
    "bm25_topk_prebuilt",
    "dedup_minhash_lsh",
    "text_quality_score",
    "doc_fingerprint",
    "similarity_ann_lsh",
    # round 14 (VERDICT r13 item 5): the entries the r13/r14 optimizer
    # actually works on, promoted into the reported set — ADDITIONS
    # ONLY; the original 13 rows are unchanged and `value_r13_comparable`
    # below keeps the old total series directly comparable.
    "text_stats",
    "decontaminate_train_split",
    "similarity_topk",
]

#: rows added in round 14 — excluded from the *_comparable totals so
#: cross-round series stay apples-to-apples
R14_ROWS = {"text_stats", "decontaminate_train_split", "similarity_topk"}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    )
    spark.sparkContext.setLogLevel("ERROR")

    # FINAL_REGISTRY FIRST so the original lookup precedence for every
    # pre-r14 headline name is unchanged (e.g. the FINAL_REGISTRY
    # dedup_minhash_lsh is the self-verifying union, NOT the headline
    # operator this bench has always timed); it only CONTRIBUTES names
    # the other registries lack (text_stats — the r14 addition)
    registry = {**FINAL_REGISTRY, **REGISTRY, **LLM_REGISTRY}

    # untimed warmup: JVM/codegen spin-up + scan of the two hot tables
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    spark.read.parquet(f"{sf_dir}/documents.parquet").limit(1000).write.format(
        "noop"
    ).mode("overwrite").save()
    # spin up the reusable Python workers (numpy/pandas import once per
    # executor thread) so Arrow-kernel queries measure compute, not fork
    @F.pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        return x

    spark.range(0, int(cpus) * 4, 1, int(cpus)).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    # round 8 (VERDICT r7 item 7): 5 reps by default — the r7 +23% total
    # "regression" was pure host-state variance (every query inside its
    # r6 band; the ×100 bench identical to the millisecond); more reps +
    # the published band midpoint make round-over-round totals stable
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))

    def run_noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # dedup_exact's registry entry grew an op=line union branch (round 3)
    # — bench the PURE exact-dedup operator so the headline number stays
    # comparable across rounds, and time the line-dedup composition as
    # its own entry
    from datalake_public_spark.operators.dedup import exact_dedup, line_dedup

    def _docs(spark_, sfd):
        return spark_.read.parquet(f"{sfd.rstrip('/')}/documents.parquet")

    def _grouped_docs(spark_, sfd):
        d = _docs(spark_, sfd)
        return (
            d.groupBy(F.expr("doc_id DIV 3").alias("gid"))
            .agg(
                F.concat_ws(
                    "\n",
                    F.lit("== hdr =="),
                    F.concat_ws(
                        "\n",
                        F.transform(
                            F.sort_array(F.collect_list(F.struct("doc_id", "text"))),
                            lambda s: s["text"],
                        ),
                    ),
                    F.lit("== ftr =="),
                ).alias("text")
            )
            .select(F.col("gid").alias("doc_id"), "text")
        )

    def _bm25(spark_, sfd):
        from datalake_public_spark.operators.retrieval import (
            DRIVER_QUERIES,
            bm25_topk,
        )

        q = spark_.createDataFrame(
            list(DRIVER_QUERIES), "query_id int, qtext string"
        )
        return bm25_topk(_docs(spark_, sfd).select("doc_id", "text"), q, k=10)

    # prebuilt BM25 is the HEADLINE retrieval row (round 8 — VERDICT r7
    # item 6: a 100 TB deployment runs the build-once index path, so the
    # bench publishes that regime's number); the index build is untimed
    # like the bucketed-fact materialization — paid once at ingest.
    _bm25_idx: dict[str, str] = {}

    def _bm25_prebuilt(spark_, sfd):
        import tempfile

        from datalake_public_spark.operators.retrieval import (
            DRIVER_QUERIES,
            bm25_build_index,
            bm25_topk_prebuilt,
        )

        root = _bm25_idx.get(sfd)
        if root is None:
            root = tempfile.mkdtemp(prefix="bm25_bench_idx_")
            bm25_build_index(
                _docs(spark_, sfd).select("doc_id", "text"), root
            )
            _bm25_idx[sfd] = root
        q = spark_.createDataFrame(
            list(DRIVER_QUERIES), "query_id int, qtext string"
        )
        return bm25_topk_prebuilt(spark_, root, q, k=10)

    extra = {
        "dedup_exact": lambda s, d: exact_dedup(_docs(s, d)),
        "dedup_lines": lambda s, d: line_dedup(_grouped_docs(s, d)),
        "bm25_topk": _bm25,
        "bm25_topk_prebuilt": _bm25_prebuilt,
    }

    def build(name):
        if name in extra:
            return extra[name](spark, sf_dir)
        return registry[name].spark(spark, sf_dir)

    # host-speed calibration (round 11 — VERDICT r10 item 1): fixed
    # code-stable probes before and after the timed reps, published as
    # `canary` so a cross-round total delta can be read against the
    # measured host ratio (r10's host drifted 10-25% with steal at 0%
    # and every row inflated — incl. the pure-scan q1, +81%)
    from tools.host_canary import host_canary
    from tools.hostinfo import page_cache_gb

    def _canary(spark) -> dict:
        # page-cache GiB beside the frozen CPU probes (round 12): the
        # CPU canary cannot see disk-cold vintages — see tools/hostinfo
        c = host_canary(spark)
        c["page_cache_gb"] = page_cache_gb()
        return c

    canary: dict[str, dict] = {}
    try:
        canary["start"] = _canary(spark)
    except Exception as e:
        canary["start"] = {"err": str(e)[:200]}

    from datalake_public_spark.operators.dedup import release_caches

    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for _rep in range(reps):
        for name in HEADLINE:
            df = build(name)
            samples[name].append(run_noop(df))
            # release operator-adopted caches between reps (round 14):
            # a persisted intermediate materialized inside rep 1's timed
            # region would otherwise be silently reused by reps 2..N via
            # CacheManager plan matching, and the published min would
            # measure a warm cache instead of the computation — the same
            # per-rep clearCache discipline the sweep/probe tools apply.
            # No-op for entries that adopt no caches.
            release_caches(df)
    try:
        canary["end"] = _canary(spark)
    except Exception as e:
        canary["end"] = {"err": str(e)[:200]}
    timings = {n: round(min(ts), 3) for n, ts in samples.items()}
    # band columns (round-6, VERDICT r5 item 8): the r5 band study
    # measured 11-38% per-query spread on idle runs of this box, so a
    # bare min invites point-vs-point noise verdicts — report the
    # observed [min, max] per query alongside, `queries` stays the min
    # for round-over-round comparability
    bands = {
        n: [round(min(ts), 3), round(max(ts), 3)] for n, ts in samples.items()
    }

    # bucketed fact-layout twins (materialization untimed; see docstring)
    import shutil
    import tempfile

    from datalake_public_spark.sinks.bucketing import (
        materialize_fact_buckets,
        materialize_orders_custkey_buckets,
        q3_top_orders_bucketed,
        q5_regional_revenue_bucketed,
        tpch_trio_bucketed,
        window_suite_bucketed,
    )

    bdir = tempfile.mkdtemp(prefix="bkt_")
    o_tbl, l_tbl = materialize_fact_buckets(
        spark, sf_dir, bdir, n_buckets=int(cpus)
    )
    ck_tbl = materialize_orders_custkey_buckets(
        spark, sf_dir, bdir, n_buckets=int(cpus)
    )
    bucketed_best: dict[str, float] = {}
    for _rep in range(reps):
        for name, fn in (
            ("q3_top_orders_bucketed", q3_top_orders_bucketed),
            ("q5_regional_revenue_bucketed", q5_regional_revenue_bucketed),
            # round 13: the analytic twin — zero-Exchange windows over
            # the custkey-bucketed layout (×1000 A-B in SCALE3_r13)
            ("window_suite_bucketed", lambda s, _sf, _o, _l: window_suite_bucketed(s, ck_tbl)),
            # round 14: tpch_breadth's heavy trio over the same layout
            # (×100 A-B 31.0 → 12.9 s; ×1000 rows in SCALE3_r14)
            *[
                (
                    f"tpch_{op}_bucketed",
                    lambda s, sfd, o, l, _op=op: tpch_trio_bucketed(
                        s, sfd, o, l
                    )[_op],
                )
                for op in ("q9", "q12", "q21")
            ],
        ):
            t = run_noop(fn(spark, sf_dir, o_tbl, l_tbl))
            bucketed_best[name] = min(bucketed_best.get(name, float("inf")), t)
    for tbl in (o_tbl, l_tbl, ck_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(bdir, ignore_errors=True)

    # round-3 extension queries report separately (like `bucketed`) so
    # `value` keeps summing a stable core set across rounds; round 8
    # promoted bm25_topk_prebuilt into the core (the regime the design
    # recommends at scale), so `value_r7_comparable` excludes it for
    # direct round-over-round total comparison
    EXTENSIONS = {"dedup_lines", "bm25_topk"}
    core = {n: t for n, t in timings.items() if n not in EXTENSIONS}
    total = round(sum(core.values()), 3)
    r14_sum = sum(core.get(n, 0.0) for n in R14_ROWS)
    mid = {
        n: round((bands[n][0] + bands[n][1]) / 2, 3) for n in core
    }
    # One bench, one vintage (VERDICT r8 nit 2): a builder-local run is
    # stamped with its role so a BENCH_LOCAL_r*.json can never be read
    # as a second source of truth — the driver's BENCH_r{N}.json (run
    # without BENCH_ROLE) is the canonical per-round number.
    role = os.environ.get("BENCH_ROLE")
    print(
        json.dumps(
            {
                **({"role": role} if role else {}),
                "metric": "headline_queries_wall_time",
                "value": total,
                # cross-round comparability: r13_comparable drops the
                # three rows round 14 ADDED; r7_comparable additionally
                # drops bm25_topk_prebuilt (the round-8 promotion) — so
                # each older total series continues unbroken
                "value_r13_comparable": round(total - r14_sum, 3),
                "value_r7_comparable": round(
                    total - core.get("bm25_topk_prebuilt", 0.0) - r14_sum, 3
                ),
                # band midpoint total: less sensitive to one lucky rep
                # than the min-sum; judge both before calling regression
                "value_band_mid": round(sum(mid.values()), 3),
                "unit": "sec",
                "queries": core,
                "sf": sf,
                "reps": reps,
                "bands": {n: bands[n] for n in core},
                "queries_band_mid": mid,
                "bucketed": {n: round(t, 3) for n, t in bucketed_best.items()},
                "extensions": {
                    n: t for n, t in timings.items() if n in EXTENSIONS
                },
                "canary": canary,
            }
        )
    )
    import shutil as _sh

    for root in _bm25_idx.values():
        _sh.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
