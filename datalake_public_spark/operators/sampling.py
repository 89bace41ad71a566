"""Dataset assembly operators for training pipelines: deterministic
splits and context-window sequence packing.

Both are pure Catalyst expressions — no UDFs, no randomness. Train/val/
test assignment must be a FUNCTION OF THE KEY, not of a random stream:
``df.randomSplit`` changes membership when partitioning changes, which
silently leaks validation docs into training across re-runs. A
multiplicative hash of the stable id gives the same split on any
cluster, any partition count, any engine (the arithmetic is plain
64-bit modular math, so the DuckDB oracle reproduces it exactly —
engine-native hash() functions differ and would not be portable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative hash constant (2^32 / golden ratio).
KNUTH = 2654435761
M32 = 2**32
_M16 = 2**16

# The hash is (key * KNUTH) mod 2^32 — which mathematically depends only
# on key mod 2^32, but the naive int64 product overflows once
# key > (2^63-1)/KNUTH ≈ 3.47e9 (Spark ANSI raises ARITHMETIC_OVERFLOW;
# DuckDB silently promotes to hugeint — a cross-engine divergence on top
# of the crash). Found at the ×1000 rung (round 11): replicated doc_ids
# reach 1e10, exactly the id range a 100 TB corpus carries. Fix: 16-bit
# hi/lo decomposition of key mod 2^32 —
#   (k32·K) mod 2^32 = (lo·K mod 2^32 + (hi·K mod 2^16)·2^16) mod 2^32
# with every intermediate ≤ 65535·KNUTH ≈ 1.7e14 — overflow-free for the
# FULL nonnegative int64 key range in both engines, and bucket-identical
# to the old formula wherever it didn't overflow (pinned in tests).
#
# Round 12 (ADVICE r11): the key is pmod-reduced first, so NEGATIVE keys
# are well-defined and engine-identical too — Spark's `%` follows the
# dividend sign and its bitwiseAND/shiftright act on two's-complement
# bits, while DuckDB's `%`/`//` follow different conventions; without
# the pmod a negative id silently produced engine-DIVERGENT buckets.
# pmod(k, 2^32) == k % 2^32 for k >= 0, so nonnegative behavior (and
# every pinned bucket) is unchanged. The same mix now also backs
# sample_priority, which until round 12 still carried the bare
# (k*KNUTH) % 2^32 overflow this block describes.


def _knuth32(key: Column | str) -> Column:
    """(key · KNUTH) mod 2^32 as an overflow-free Catalyst expression,
    defined for the FULL int64 key range (negatives via pmod)."""
    k = F.pmod(
        (F.col(key) if isinstance(key, str) else key).cast("long"),
        F.lit(M32),
    )
    # shiftright/bitwiseAND keep the lanes integer-typed end to end (a
    # `/` here would detour through double — exact below 2^53, but a
    # needless type divergence from the SQL twin's integer `//`); both
    # are bit-exact to % / // because k is nonnegative after the pmod
    lo = k.bitwiseAND(F.lit(_M16 - 1))
    hi = F.shiftright(k, 16)
    return (
        (lo * F.lit(KNUTH)) % F.lit(M32)
        + ((hi * F.lit(KNUTH)) % F.lit(_M16)) * F.lit(_M16)
    ) % F.lit(M32)


def _knuth32_sql(key: str) -> str:
    k32 = f"((({key} % {M32}) + {M32}) % {M32})"
    lo = f"({k32} % {_M16})"
    hi = f"({k32} // {_M16})"
    return (
        f"(((({lo} * {KNUTH}) % {M32}) + (({hi} * {KNUTH}) % {_M16}) * {_M16})"
        f" % {M32})"
    )


def split_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic [0, n_buckets) bucket from an integer key —
    overflow-free modular multiply, valid for any int64."""
    return _knuth32(key) % F.lit(n_buckets)


def split_bucket_sql(key: str, n_buckets: int = 100) -> str:
    return f"(({_knuth32_sql(key)}) % {n_buckets})"


def assign_split(
    df: DataFrame,
    key_col: str,
    *,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Add a ``split`` column: train/val/test by hash bucket of the key.

    Scale: embarrassingly parallel (no shuffle, no state) — the split
    of a row is decided by its own key, so 100 TB splits at scan speed
    and membership is stable under any repartitioning."""
    b = split_bucket(key_col)
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum downsampling: keep a row iff its key's
    hash bucket falls under the stratum's rate (``rates`` in [0, 1]).

    The training-mixture primitive: rebalance sources/classes by keeping
    e.g. 100% of rare strata and 5% of dominant ones. Same guarantees as
    ``assign_split`` — membership is a pure function of (key, rate), so
    re-runs, engines, and partitionings all agree, and a row kept at
    rate r stays kept at any rate ≥ r (nested samples for ablations).
    Scale: no shuffle — a scan-time filter; Catalyst folds the rate
    lookup into a CASE expression."""
    b = split_bucket(key_col)
    rate_expr: Column = F.lit(float(default_rate) * 100.0)
    for stratum, rate in sorted(rates.items()):
        rate_expr = F.when(
            F.col(stratum_col) == stratum, F.lit(float(rate) * 100.0)
        ).otherwise(rate_expr)
    return df.filter(b < rate_expr)


def sample_priority(key: Column | str, weight: Column | str) -> Column:
    """A-ES weighted-sampling priority: ``ln(u) / w`` with a DETERMINISTIC
    uniform ``u`` derived from the key's hash bucket.

    Efraimidis–Spirakis sampling keeps the k rows with the largest
    ``u^(1/w)`` — monotone-equivalent to ``ln(u)/w``, which avoids ``pow``.
    ``u = ((key·KNUTH) mod 2^32 + 0.5) / 2^32`` is exact IEEE arithmetic
    (integer + 0.5, divided by a power of two), so Spark and the DuckDB
    oracle compute bit-identical ``u``; priorities then differ at most in
    the last ulp of ``ln``, far below the inter-row gaps that decide
    membership. The modular multiply is the shared overflow-free
    ``_knuth32`` mix (round 12 — this site kept the bare ``k*KNUTH``
    product after split_bucket's r11 fix, so it crashed/diverged on the
    same > 3.47e9 id range; values are unchanged wherever the old form
    worked, pinned in tests).
    """
    w = F.col(weight) if isinstance(weight, str) else weight
    u = (_knuth32(key) + F.lit(0.5)) / F.lit(float(M32))
    return F.ln(u) / w


def sample_priority_sql(key: str, weight: str) -> str:
    return f"ln(({_knuth32_sql(key)} + 0.5) / {float(M32)}) / {weight}"


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    group_col: str | None = None,
) -> DataFrame:
    """Weighted sample WITHOUT replacement: the k rows with the highest
    deterministic A-ES priority; inclusion probability ∝ weight.

    The training-mixture counterpart to ``stratified_sample`` when the
    budget is a fixed ROW COUNT rather than per-stratum rates: e.g. "pick
    1M documents, long docs proportionally more often", reproducibly.

    Scale: the global form is sort-limit, which Spark executes as
    TakeOrderedAndProject — per-partition top-k heaps merged on the
    driver, no full sort, no shuffle of the data. With ``group_col`` it
    is one window (single shuffle on the group key) keeping k rows per
    group. Rows with weight <= 0 are excluded (A-ES requires w > 0)."""
    pr = sample_priority(key_col, weight_col)
    pos = df.filter(F.col(weight_col) > 0)
    if group_col is None:
        return pos.orderBy(pr.desc(), F.col(key_col).asc()).limit(k)
    w = Window.partitionBy(group_col).orderBy(pr.desc(), F.col(key_col).asc())
    return (
        pos.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    dataset-assembly step for training on documents longer than the
    context window (sliding window with ``overlap`` tokens of shared
    context between consecutive chunks; contrast pack_sequences, which
    bins WHOLE short docs).

    Returns one row per chunk: (id, chunk_idx, chunk_text,
    n_chunk_tokens). Chunk boundaries are a pure function of the token
    count — posexplode over a start-offset sequence, slice, re-join —
    so chunking is a single scan-speed projection, embarrassingly
    parallel, no shuffle. Docs with NULL text produce no chunks."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    from datalake_public_spark.functions import text_funcs as T

    step = max_tokens - overlap
    toks = T.tokens(text_col)
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(step))
    # explicit: greatest() SKIPS nulls (greatest(NULL,1)=1 in both Spark
    # and DuckDB), so a NULL text would otherwise yield one junk chunk
    docs = docs.filter(F.col(text_col).isNotNull())
    chunked = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(starts).alias("chunk_idx", "_start"),
    )
    # stage the sliced array under a name: tokenize+slice is an
    # interpreted chain with no codegen CSE, so referencing it from both
    # chunk_text and n_chunk_tokens in one projection would tokenize the
    # full document twice per chunk row (review finding r3)
    sliced = chunked.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.slice(T.tokens(text_col), F.col("_start"), max_tokens).alias("_chunk"),
    )
    return sliced.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.array_join("_chunk", " ").alias("chunk_text"),
        F.size("_chunk").alias("n_chunk_tokens"),
    )


def pack_sequences(
    docs: DataFrame,
    *,
    order_col: str = "doc_id",
    group_col: str = "source",
    tokens_col: str = "n_tokens",
    ctx_len: int = 2048,
) -> DataFrame:
    """Assign each doc to a context-window bin: docs are laid end-to-end
    in ``order_col`` order within each group, and a doc starting at
    token offset T lands in bin floor(T / ctx_len) — the streaming
    concatenate-then-chunk packing LLM dataloaders use.

    Deterministic: the bin is a function of the exclusive running token
    sum, an integer; ctx_len is a power of two so the division is exact
    in any engine. Scale: one window (one shuffle on ``group_col``) —
    no driver-side loop; skewed groups split fine because the window is
    a running sum, which Spark computes in one pass per partition."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return docs.withColumn("bin", F.floor(cum_excl / F.lit(ctx_len)))


def epoch_shuffle(
    docs: DataFrame,
    *,
    seed: int = 0,
    epoch: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic, engine-portable global shuffle for training-epoch
    ordering: every row gets ``shuffle_key = md5(id ':' seed ':' epoch)``
    and the frame is globally sorted by it. md5 of the same string is
    identical in Spark, DuckDB, and any dataloader — so the permutation
    is reproducible ACROSS ENGINES and runs, unlike rand(seed) (whose
    stream is partitioning-dependent) or xxhash64 (Spark-only).

    Each epoch is an independent permutation (the epoch is folded into
    the hashed string). Scale: Spark plans orderBy as a range-partitioned
    sort; md5 keys are uniformly distributed, so ranges balance with no
    skew, and a downstream ``head``/``limit`` collapses to
    TakeOrderedAndProject (no full sort materialized). No global
    row-number is assigned here on purpose — a position column would
    force a single-partition window; writers consume the ORDER."""
    key = F.md5(
        F.concat_ws(
            ":",
            F.col(id_col).cast("string"),
            F.lit(str(int(seed))),
            F.lit(str(int(epoch))),
        )
    )
    return docs.withColumn("shuffle_key", key).orderBy("shuffle_key")


def temperature_mixture(
    df: DataFrame,
    key_col: str,
    domain_col: str,
    *,
    alpha: float = 0.5,
    base_rate: float = 0.5,
) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual/domain
    mixing rule: sample domain d with probability ∝ n_d^alpha, so
    alpha < 1 upweights rare domains). Rates are anchored at the
    DOMINANT domain: it keeps ``base_rate`` of its rows and every other
    domain keeps ``min(1, base_rate * (n_max/n_d)^(1-alpha))`` — the
    exact keep-rate ratio temperature sampling implies, without a global
    normalizer whose float summation order would differ across engines.

    At alpha=0.5 every arithmetic step (int→double, divide, sqrt,
    multiply, min) is IEEE-correctly-rounded, so rates — and therefore
    MEMBERSHIP — are bit-identical in any engine BY CONSTRUCTION (the
    oracle-safety rule: design guarantees, not observed agreement).
    Other alphas go through pow(), whose last-ulp behavior is
    platform-defined: fine for production, not for exact-equality
    oracles.

    Scale: one tiny groupBy for domain counts, broadcast back, then a
    scan-time hash filter — membership is a pure function of
    (key, domain counts), stable under repartitioning; rows keep a
    ``mixture_rate`` audit column."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
    # global window over the POST-AGG domain table (a few rows), not data
    nmax = F.max("__n").over(Window.partitionBy())
    ratio = nmax.cast("double") / F.col("__n").cast("double")
    factor = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, 1.0 - alpha)
    rates = counts.select(
        domain_col,
        F.least(F.lit(1.0), F.lit(float(base_rate)) * factor).alias(
            "mixture_rate"
        ),
    )
    hashed = (F.col(key_col) * F.lit(KNUTH)) % F.lit(M32)
    return df.join(F.broadcast(rates), domain_col).filter(
        hashed.cast("double") < F.col("mixture_rate") * F.lit(float(M32))
    )


def temperature_mixture_sql(
    table: str, key: str, domain: str, base_rate: float = 0.5
) -> str:
    """The alpha=0.5 mixture as ANSI SQL — lockstep twin of
    ``temperature_mixture`` (same correctly-rounded operation sequence,
    so membership matches bit-for-bit)."""
    return f"""
SELECT t.*, r.mixture_rate
FROM {table} t
JOIN (
  SELECT {domain} AS d,
         least(1.0, {float(base_rate)} * sqrt(
           CAST((SELECT max(n) FROM (
             SELECT count(*) AS n FROM {table} GROUP BY {domain})) AS DOUBLE)
           / CAST(count(*) AS DOUBLE))) AS mixture_rate
  FROM {table} GROUP BY {domain}
) r ON t.{domain} = r.d
WHERE CAST(({key} * {KNUTH}) % {M32} AS DOUBLE) < r.mixture_rate * {float(M32)}
"""
