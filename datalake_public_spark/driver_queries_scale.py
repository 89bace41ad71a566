"""Sweep-time BOUNDED twins of the quadratic-oracle dedup entries
(VERDICT r5 item 1: the four unbounded exact oracles were 59% of the
×10 sweep and made a ×100 correctness sweep infeasible — the same
problem r5 solved for the cosine oracle with
``dedup_embedding_cosine_blocked``).

Template (identical to the cosine twin): BOTH engines restrict pair
scoring to deterministic ``id DIV band`` bands, so the restriction is
applied identically and the compare stays exact; the UNBOUNDED entries
still run at every driver-gate SF (0.001/0.01/0.1); each bounded result
row records its coverage note in the sweep artifact
(tools/scale_sweep.py). With ``band = 10_000_000`` (the replication KEY
OFFSET of tools/scale_replicate.py) a band is exactly one replica of
the source corpus, so the bounded work/output scale LINEARLY in corpus
size instead of quadratically in the replication factor — cross-band
pairs are the exact-copy cliques, owned by the (unbounded, linear)
``dedup_exact`` entry at every rung.

Subset/equality pins: tests/test_dedup.py asserts each banded twin is a
strict subset of its unbounded entry with identical values on the
covered pairs at a driver-gate SF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalake_public_spark.driver_queries import _t
from datalake_public_spark.driver_queries_llm import (
    ngram_pairs_sql,
    simhash_pairs_sql,
)
from datalake_public_spark.operators import dedup as D


def dedup_simhash_banded(band: int):
    def q(spark: SparkSession, sf: str) -> DataFrame:
        # dedup-first lift (round 11), banding at lift time as a doc-id
        # equi-key — same pair set as the direct banded kernel (pinned)
        return D.simhash_clusters_via_reps(
            _t(spark, sf, "documents"), max_hamming=3, band=band
        )

    return q


def dedup_simhash_banded_sql(band: int) -> str:
    return simhash_pairs_sql(band)


def dedup_ngram_fuzzy_banded(band: int):
    """Banded twin of driver_registry.dedup_ngram_fuzzy: the within/cross
    baselines pair only within bands; the fuzzy-join branch runs the
    production operator with its ``id_band`` boundedness key (round 8 —
    the r7 form ran fuzzy UNRESTRICTED and post-filtered, which expanded
    ~200M within-bucket candidates from the replicated corpus's
    cross-band exact-copy cliques only to discard them: 69.5 s of the
    entry's 94 s ×100 engine time; the keyed form yields the same
    same-band pair set linearly — see fuzzy_join_minhash's docstring for
    the per-id-band bucket-cap nuance, which only ever ADDS
    exact-verified pairs and leaves every emitted row and invariant
    unchanged). The post-filter stays as a no-op guard."""

    def q(spark: SparkSession, sf: str) -> DataFrame:
        docs = _t(spark, sf, "documents")
        none_bool = F.lit(None).cast("boolean")
        # dedup-first (round 10): the banded pair set lifts from the
        # exact-dedup representatives' pairs — same ids AND jaccard
        # values as the direct kernel (operators/dedup.py
        # ngram_jaccard_pairs_via_reps, pinned), with the quadratic
        # shingle self-join running on unique texts only; the minhash
        # fuzzy join below remains the entry's full-corpus LSH workout
        from datalake_public_spark.driver_registry import (
            ENTRY_PHASES,
            _timed_phase,
        )

        ENTRY_PHASES.pop("dedup_ngram_jaccard", None)
        within_lo = D.ngram_jaccard_pairs_via_reps(
            docs, threshold=0.45, band=band
        ).persist()
        with _timed_phase("dedup_ngram_jaccard", "within_pairs"):
            within_lo.count()
        within = within_lo.filter(F.col("jaccard") >= 0.5)
        w_rows = within.select(
            F.lit("within").alias("op"), "id_a", "id_b", "jaccard",
            none_bool.alias("ok"),
        )
        left = docs.filter(F.col("doc_id") % 2 == 0)
        right = docs.filter(F.col("doc_id") % 2 == 1)
        # round 12: the cross-table fuzzy join lifts through each side's
        # exact-dedup representatives too (fuzzy_join_minhash_via_reps —
        # FULL set equality with the direct operator incl. the
        # doc-weighted bucket cap, pinned crafted + property + sf-smoke;
        # at ×1000 the direct form's two full-side signature passes were
        # 61.8 s of this entry's 139.1 s). The minhash family keeps its
        # full-corpus at-scale kernel workout in dedup_minhash_lsh.
        fuzzy = (
            D.fuzzy_join_minhash_via_reps(
                left, right, threshold=0.5, id_band=band
            )
            .filter(
                F.expr(f"left_id DIV {band}") == F.expr(f"right_id DIV {band}")
            )
            .persist()
        )
        with _timed_phase("dedup_ngram_jaccard", "fuzzy_minhash"):
            fuzzy.count()

        def _cross_parity(pairs):
            return pairs.filter(
                (F.col("id_a") + F.col("id_b")) % 2 == 1
            ).select(
                F.when(F.col("id_a") % 2 == 0, F.col("id_a"))
                .otherwise(F.col("id_b"))
                .alias("left_id"),
                F.when(F.col("id_a") % 2 == 0, F.col("id_b"))
                .otherwise(F.col("id_a"))
                .alias("right_id"),
                "jaccard",
            )

        exact_cross = _cross_parity(within)
        exact_cross_lo = _cross_parity(within_lo)
        fuzzy_vis = fuzzy.select("left_id", "right_id").join(
            exact_cross, ["left_id", "right_id"]
        )
        c_rows = (
            exact_cross.unionByName(fuzzy_vis.select(*exact_cross.columns))
            .distinct()
            .select(
                F.lit("cross").alias("op"),
                F.col("left_id").alias("id_a"),
                F.col("right_id").alias("id_b"),
                "jaccard",
                none_bool.alias("ok"),
            )
        )
        n_f = fuzzy.agg(F.count(F.lit(1)).alias("n_f"))
        n_m = (
            fuzzy.alias("f")
            .join(
                exact_cross_lo.alias("e"),
                (F.col("f.left_id") == F.col("e.left_id"))
                & (F.col("f.right_id") == F.col("e.right_id"))
                & (F.abs(F.col("f.jaccard") - F.col("e.jaccard")) <= 0.02),
                "left_semi",
            )
            .agg(F.count(F.lit(1)).alias("n_m"))
        )
        n_e = exact_cross.agg(F.count(F.lit(1)).alias("n_e"))
        inv = (
            n_f.crossJoin(n_m)  # 1×1 aggregate pairs — bounded
            .crossJoin(n_e)
            .select(
                F.lit("invariants").alias("op"),
                F.lit(None).cast("long").alias("id_a"),
                F.lit(None).cast("long").alias("id_b"),
                F.lit(None).cast("double").alias("jaccard"),
                (
                    (F.col("n_m") == F.col("n_f"))
                    & (F.col("n_f") * 2 >= F.col("n_e"))
                ).alias("ok"),
            )
        )
        return D._adopt_caches(
            w_rows.unionByName(c_rows).unionByName(inv), within_lo, fuzzy
        )

    return q


def dedup_ngram_fuzzy_banded_sql(band: int) -> str:
    banded = ngram_pairs_sql(band=band)
    return f"""
SELECT 'within' AS op, id_a, id_b, jaccard, CAST(NULL AS BOOLEAN) AS ok
FROM ({banded}) w
UNION ALL
SELECT 'cross',
       CASE WHEN id_a % 2 = 0 THEN id_a ELSE id_b END,
       CASE WHEN id_a % 2 = 0 THEN id_b ELSE id_a END,
       jaccard, NULL
FROM ({banded}) c
WHERE (id_a + id_b) % 2 = 1
UNION ALL
SELECT 'invariants', NULL, NULL, NULL, TRUE
"""


def dedup_components_banded(band: int):
    """Banded twin of driver_registry.dedup_components_corpus: the
    'component' branch's pair graph is banded (transitive closure on the
    restricted graph in BOTH engines); the 'survivor' branch runs
    UNRESTRICTED — it operates on exact-dup representatives, whose count
    is replication-invariant, so it stays tractable at any rung."""

    def q(spark: SparkSession, sf: str) -> DataFrame:
        from datalake_public_spark.driver_registry import (
            ENTRY_PHASES,
            _timed_phase,
        )
        from datalake_public_spark.operators.components import (
            connected_components,
        )

        # same inline phase map as the unbanded corpus entry (VERDICT
        # r9 item 5) — the CC rounds run eagerly at build, so the build
        # times itself; the sweep attaches ENTRY_PHASES as op_spark_s
        ENTRY_PHASES.pop("dedup_components", None)
        docs = _t(spark, sf, "documents")
        groups = D.exact_dedup(docs).persist()
        reps = docs.join(
            groups.select(F.col("keep_id").alias("doc_id")), "doc_id",
            "left_semi",
        ).persist()
        with _timed_phase("dedup_components", "exact_prepass"):
            reps.count()
        lsh_pairs = D.minhash_lsh_pairs(reps, threshold=0.5)
        # rep_pairs for the lift MUST be UNBANDED (the band applies to
        # DOC ids at lift time, not rep ids — via_reps validates the
        # column shape and documents this contract); the band kwarg
        # below is the only banding in this entry
        exact_pairs = (
            D.ngram_jaccard_pairs(reps, threshold=0.5)
            .select("id_a", "id_b")
            .persist()
        )
        with _timed_phase("dedup_components", "ngram_pairs"):
            exact_pairs.count()
        # component branch, dedup-first (round 10): the banded
        # full-corpus pair graph lifts from the rep pairs above — the
        # band restriction joins as an equi-key inside the lift, so
        # out-of-band pairs are never materialized (operators/dedup.py
        # ngram_jaccard_pairs_via_reps; equality with the direct banded
        # kernel pinned in tests/test_dedup.py)
        with _timed_phase("dedup_components", "cc_exact_graph"):
            edges = D.ngram_jaccard_pairs_via_reps(
                docs,
                threshold=0.5,
                band=band,
                groups=groups,
                reps=reps,
                rep_pairs=exact_pairs,
            )
            labels = connected_components(
                edges,
                src="id_a",
                dst="id_b",
                vertices=docs.select(F.col("doc_id").alias("node")),
            )
        comp = labels.select(
            F.lit("component").alias("op"),
            F.col("node").alias("doc_id"),
            "component",
        )
        pairs = (
            exact_pairs.unionByName(
                lsh_pairs.select("id_a", "id_b").join(
                    exact_pairs, ["id_a", "id_b"], "left_semi"
                )
            )
            .distinct()
        )
        with _timed_phase("dedup_components", "cc_union_lsh"):
            rep_labels = connected_components(
                pairs,
                src="id_a",
                dst="id_b",
                vertices=reps.select(F.col("doc_id").alias("node")),
            )
        survivors = rep_labels.filter(
            F.col("node") == F.col("component")
        ).select(F.col("node").alias("doc_id"))
        surv = reps.join(survivors, "doc_id", "left_semi").select(
            F.lit("survivor").alias("op"),
            "doc_id",
            F.lit(None).cast("long").alias("component"),
        )
        return D._adopt_caches(
            comp.unionByName(surv), reps, lsh_pairs, exact_pairs, groups
        )

    return q


def dedup_components_banded_sql(band: int) -> str:
    from datalake_public_spark.driver_queries_llm import _REPS_SOURCE

    banded = ngram_pairs_sql(band=band)
    rep_pairs = ngram_pairs_sql(_REPS_SOURCE)
    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({banded}) q
),
und AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT u.dst, r.root FROM reach r JOIN und u ON u.src = r.node
)
SELECT 'component' AS op, node AS doc_id, min(root) AS component
FROM reach GROUP BY node
UNION ALL
SELECT 'survivor', doc_id, CAST(NULL AS BIGINT)
FROM (
  WITH RECURSIVE
  reps AS (SELECT min(doc_id) AS id FROM documents GROUP BY text),
  rep_pairs AS (SELECT id_a, id_b FROM ({rep_pairs}) rp),
  undr AS (
    SELECT id_a AS src, id_b AS dst FROM rep_pairs
    UNION
    SELECT id_b, id_a FROM rep_pairs
  ),
  reachr(node, root) AS (
    SELECT id, id FROM reps
    UNION
    SELECT u.dst, r.root FROM reachr r JOIN undr u ON u.src = r.node
  )
  SELECT node AS doc_id FROM reachr GROUP BY node HAVING node = min(root)
) s
"""
