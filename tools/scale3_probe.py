"""×1000 scale rung: spark-only timing probe over a curated entry subset.

The ×10/×100 sweeps are the CORRECTNESS rungs (DuckDB oracle per
entry). This probe adds one more decade of SCALE evidence — 600M
lineitem / 100M events / 50M docs / 2M vectors — where an oracle is
not viable (a DuckDB recursive CTE over 50M docs runs for hours) and
several registry entries are out of contract by construction (the
replicated key space exceeds int32, and a few entries legitimately
cast ids to INT — the scale_replicate KEY_OFFSET note). So: a curated
subset that keeps ids as long, timed through the noop sink (pure
engine work — no driver collect), with row-count sanity per entry and
the host canary at start/mid/end.

What the subset exercises, one entry per scale-critical plan family:
scan+agg (q1), fact⋈fact join (q3, q5), md5-groupBy dedup
(dedup_exact), LSH banding (dedup_minhash_lsh), the dedup-first lift +
connected components (dedup_components banded twin), the simhash lift
(banded twin), the fuzzy-join composition (dedup_ngram_jaccard banded
twin), broadcast decontamination, Arrow text kernels (text_stats,
doc_fingerprint), and brute-force cosine (similarity_topk).

Usage: python tools/scale3_probe.py [sf_dir] [out_json] [reps=2]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_sf100"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/SCALE3_r11.json"
    # default 1 timed rep: each entry additionally pays one full count()
    # pass for row sanity, and a full ×1000 pass across the subset is
    # ~20 min — the canary contextualizes single-rep numbers
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from datalake_public_spark import EngineConfig, get_spark
    from datalake_public_spark import driver_registry as DR
    from datalake_public_spark.driver_queries_scale import (
        dedup_components_banded,
        dedup_ngram_fuzzy_banded,
        dedup_simhash_banded,
    )
    from tools.host_canary import host_canary
    from tools.hostinfo import page_cache_gb

    def canary_with_cache(spark) -> dict:
        # page_cache_gb sits beside the frozen CPU probes: scan-bound
        # rows read disk when the 17 GB corpus exceeds what's cached
        # (the r11-warm vs r12-cold vintage difference, see hostinfo)
        c = host_canary(spark)
        c["page_cache_gb"] = page_cache_gb()
        return c

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        EngineConfig(master=f"local[{cpus}]", shuffle_partitions=int(cpus) * 2)
    )
    spark.sparkContext.setLogLevel("ERROR")

    BAND = int(os.environ.get("SWEEP_ID_BAND", "10000000"))

    # q5 spill lever (VERDICT r11 item 3): q5 was the rung's ONE
    # superlinear row (17× across the ×100→×1000 decade — the 6-table
    # shuffle working set exceeds page cache and the single local disk
    # becomes the bottleneck). The bucketed variant reads orders/lineitem
    # co-bucketed+sorted on the order key, so the fact join is
    # Exchange-free: the shuffle is paid ONCE at ingest (prepare_s below,
    # amortized across every fact-join query of the deployment) instead
    # of inside every q5. Build is OUTSIDE the timed reps by design.
    bucket_dir = os.environ.get("DLPS_SCALE3_BUCKET_DIR", "/tmp/scale3_buckets")
    bucket_state: dict = {}

    def prepare_buckets(spark, sf):
        from datalake_public_spark.sinks.bucketing import (
            materialize_fact_buckets,
        )

        bucket_state["names"] = materialize_fact_buckets(
            spark, sf, bucket_dir, n_buckets=64
        )

    def q5_bucketed(spark, sf):
        from datalake_public_spark.sinks.bucketing import (
            q5_regional_revenue_bucketed,
        )

        return q5_regional_revenue_bucketed(spark, sf, *bucket_state["names"])

    def q3_bucketed(spark, sf):
        from datalake_public_spark.sinks.bucketing import (
            q3_top_orders_bucketed,
        )

        return q3_top_orders_bucketed(spark, sf, *bucket_state["names"])

    entries: dict = {
        "q1_pricing_summary": DR.FINAL_REGISTRY["q1_pricing_summary"].spark,
        "q3_top_orders": DR.FINAL_REGISTRY["q3_top_orders"].spark,
        "q3_top_orders_bucketed": q3_bucketed,
        "q5_regional_revenue": DR.FINAL_REGISTRY["q5_regional_revenue"].spark,
        "q5_regional_revenue_bucketed": q5_bucketed,
        "dedup_exact": DR.FINAL_REGISTRY["dedup_exact"].spark,
        "dedup_minhash_lsh": DR.FINAL_REGISTRY["dedup_minhash_lsh"].spark,
        "dedup_components": dedup_components_banded(BAND),
        "dedup_simhash": dedup_simhash_banded(BAND),
        "dedup_ngram_jaccard": dedup_ngram_fuzzy_banded(BAND),
        "decontaminate_train_split": DR.FINAL_REGISTRY[
            "decontaminate_train_split"
        ].spark,
        "text_stats": DR.FINAL_REGISTRY["text_stats"].spark,
        "doc_fingerprint": DR.FINAL_REGISTRY["doc_fingerprint"].spark,
        "similarity_topk": DR.FINAL_REGISTRY["similarity_topk"].spark,
    }

    results: dict[str, dict] = {}
    canary = {"start": canary_with_cache(spark)}
    print("canary[start]", canary["start"], flush=True)
    t_all = time.time()

    def flush() -> None:
        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": sf_dir,
                    "role": "x1000 spark-only rung — noop-sink timing + "
                    "row-count sanity; no oracle (see module docstring); "
                    "min-of-reps",
                    "reps": reps,
                    "wall_s": round(time.time() - t_all, 1),
                    "canary": canary,
                    "results": results,
                },
                f,
                indent=1,
            )

    # build is idempotent (tableExists): the FIRST bucketed entry pays
    # prepare_s, the second records ~0 — one ingest shuffle amortized
    # across every fact-join query, which is the layout's argument
    prepares = {
        "q3_top_orders_bucketed": prepare_buckets,
        "q5_regional_revenue_bucketed": prepare_buckets,
    }

    names = list(entries)
    for idx, name in enumerate(names):
        if idx == len(names) // 2:
            canary["mid"] = canary_with_cache(spark)
            print("canary[mid]", canary["mid"], flush=True)
        fn = entries[name]
        times: list[float] = []
        prep_s = None
        try:
            if name in prepares:
                t0 = time.time()
                prepares[name](spark, sf_dir)
                prep_s = round(time.time() - t0, 1)
            for _ in range(reps):
                spark.catalog.clearCache()
                DR.ENTRY_PHASES.pop(name, None)
                t0 = time.time()
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                times.append(round(time.time() - t0, 1))
            n_rows = fn(spark, sf_dir).count()
            results[name] = {
                "spark_s": min(times),
                "spark_s_reps": times,
                "rows": n_rows,
            }
            if prep_s is not None:
                # one-time ingest cost (bucket materialization), NOT part
                # of the per-query timing — the layout's whole point
                results[name]["prepare_s"] = prep_s
            ops = DR.ENTRY_PHASES.get(name)
            if ops:
                results[name]["op_spark_s"] = dict(ops)
        except Exception as e:
            results[name] = {"err": str(e)[:300], "spark_s_reps": times}
        print(name, results[name], flush=True)
        flush()

    canary["end"] = canary_with_cache(spark)
    print("canary[end]", canary["end"], flush=True)
    flush()


if __name__ == "__main__":
    main()
