"""Arrow/numpy kernel twins of the rolling-hash family.

The Catalyst formulations in ``text_funcs.py`` (``rolling_hash``,
``simhash32``) are per-character interpreted higher-order functions —
nested lambdas re-evaluate captured inputs per element with no CSE
(NOTES_r1: ~5 ms/doc), which makes them scale-weak as the heart of a
per-document operator. These kernels compute the IDENTICAL values with
vectorized numpy inside Arrow-batched pandas UDFs (the same fix already
applied to minhash in ``operators/dedup.py::_minhash_kernel``); the
Catalyst expressions remain the oracle-checkable spec, and
``tests/test_text_kernels.py`` pins kernel ≡ Catalyst equivalence.

Vectorization of the sequential hash: ``h = (h*B + c) % M`` over
codepoints is a loop over CHARACTER POSITIONS (≤ max doc/token length),
each step full-batch-wide — not a loop over documents. Codepoints come
from ``str.encode('utf-32-le')`` → zero-copy uint32 view, matching
Catalyst's ``ascii()`` codepoint semantics exactly. All arithmetic stays
< 2^53 (module invariant in text_funcs), so int64 never overflows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

from datalake_public_spark.functions.text_funcs import (
    HASH_BASE,
    HASH_SEED,
    M_FINGERPRINT,
    M_SIMHASH,
)


def _rolling_hash_np(strings: list[str], modulus: int) -> np.ndarray:
    """Vectorized ``h = (seed; h*B + codepoint) % M`` per string."""
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    # Catalyst spec parity: Spark's split('', '') yields [''] and ascii('')
    # is 0, so an empty string hashes one zero code — not the bare seed
    zero = np.zeros(1, dtype=np.uint32)
    cps = [
        np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) if s else zero
        for s in strings
    ]
    lens = np.fromiter((len(a) for a in cps), dtype=np.int64, count=n)
    h = np.full(n, HASH_SEED, dtype=np.int64)
    # Bucket by ceil-power-of-2 length before padding: a dense (n ×
    # max_len) matrix is quadratic under length skew — one whitespace-free
    # megadocument/token would pad EVERY row to its length and OOM the
    # worker. Per-bucket padding waste is ≤ 2×, so total memory is
    # O(total characters) regardless of skew.
    buckets: dict[int, list[int]] = {}
    for i, l in enumerate(lens):
        b = 1 << (int(l) - 1).bit_length() if l > 1 else 1
        buckets.setdefault(b, []).append(i)
    for width, idx_list in buckets.items():
        idxs = np.asarray(idx_list, dtype=np.int64)
        sub_lens = lens[idxs]
        mat = np.zeros((len(idxs), width), dtype=np.int64)
        for r, i in enumerate(idx_list):
            mat[r, : lens[i]] = cps[i]
        hh = np.full(len(idxs), HASH_SEED, dtype=np.int64)
        for j in range(width):
            active = j < sub_lens
            if not active.any():
                break
            hh = np.where(active, (hh * HASH_BASE + mat[:, j]) % modulus, hh)
        h[idxs] = hh
    return h


def _hash_segments(
    flat: np.ndarray, starts: np.ndarray, lens: np.ndarray, modulus: int
) -> np.ndarray:
    """Rolling hash of each (start, len) segment of ``flat`` — the same
    bucketed position-loop as ``_rolling_hash_np``, but the segment
    matrix is built by ONE vectorized gather per length bucket instead
    of a per-segment Python row fill."""
    m = len(starts)
    h = np.full(m, HASH_SEED, dtype=np.int64)
    if m == 0:
        return h
    order = np.argsort(lens, kind="stable")
    sorted_lens = lens[order]
    # bucket boundaries at ceil-power-of-2 jumps (memory ≤ 2× characters)
    widths = 1 << np.maximum(
        0, np.int64(np.ceil(np.log2(np.maximum(sorted_lens, 1))))
    )
    cut = np.flatnonzero(np.diff(widths)) + 1
    for seg in np.split(np.arange(m), cut):
        if len(seg) == 0:
            continue
        idxs = order[seg]
        width = int(widths[seg[0]])
        sub_lens = lens[idxs]
        pos = starts[idxs][:, None] + np.arange(width)[None, :]
        active_mask = np.arange(width)[None, :] < sub_lens[:, None]
        mat = flat[np.minimum(pos, len(flat) - 1)].astype(np.int64)
        mat[~active_mask] = 0
        hh = np.full(len(idxs), HASH_SEED, dtype=np.int64)
        for j in range(width):
            active = active_mask[:, j]
            if not active.any():
                break
            hh = np.where(active, (hh * HASH_BASE + mat[:, j]) % modulus, hh)
        h[idxs] = hh
    return h


def _simhash_np(texts: list[str]) -> np.ndarray:
    """Batch simhash32: per-token 32-bit rolling hash, per-bit ±1 majority
    vote per document. Round-6 vectorization: ONE utf-32 encode per DOC
    (the former per-token encode + Python split loop was ~60% of kernel
    time), token boundaries found as codepoint-32 run edges in numpy,
    token hashes via the bucketed segment-gather kernel, votes
    segment-summed back per doc. Values identical to the Catalyst spec
    (tests/test_text_kernels.py pins equivalence)."""
    n = len(texts)
    out = np.zeros(n, dtype=np.int64)
    if n == 0:
        return out
    bufs = [np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32) for s in texts]
    doc_lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
    total = int(doc_lens.sum())
    if total == 0:
        return out  # zero tokens → all votes 0 → simhash 0 (matches Catalyst)
    flat = np.concatenate([b for b in bufs if len(b)])
    doc_at = np.repeat(np.arange(n, dtype=np.int64), doc_lens)
    nonspace = flat != 32  # tokens split on ASCII space ONLY (spec: split(' '))
    new_doc = np.empty(total, dtype=bool)
    new_doc[0] = True
    new_doc[1:] = doc_at[1:] != doc_at[:-1]
    is_start = nonspace & (new_doc | ~np.concatenate(([True], nonspace[:-1])))
    # a position ends a token iff nonspace and (next is space/new doc/EOF)
    next_break = np.concatenate((new_doc[1:], [True]))
    is_end = nonspace & (next_break | ~np.concatenate((nonspace[1:], [True])))
    starts = np.flatnonzero(is_start)
    ends = np.flatnonzero(is_end)
    if len(starts) == 0:
        return out
    tok_lens = ends - starts + 1
    doc_of = doc_at[starts]
    th = _hash_segments(flat, starts, tok_lens, M_SIMHASH)
    # Per-bit ±1 majority without the tokens×32 int64 ±1 matrix (whose
    # construction + scatter was memory-bandwidth bound: ~2.3 GB of
    # traffic per 20k-doc batch, 85% of kernel time). M_SIMHASH = 2^32,
    # so each token hash IS its 32 bits: view as 4 little-endian bytes,
    # unpackbits to a tokens×32 uint8 (one C pass, 32 MB/1M tokens), and
    # segment-sum the ones per doc with reduceat — token rows arrive
    # doc-ordered by construction. votes = 2*ones - n_tokens.
    bits8 = np.unpackbits(
        th.astype(np.uint32).view(np.uint8).reshape(-1, 4),
        axis=1,
        bitorder="little",
    )
    seg = np.flatnonzero(np.concatenate(([True], doc_of[1:] != doc_of[:-1])))
    ones = np.add.reduceat(bits8, seg, axis=0, dtype=np.int64)
    n_tok = np.diff(np.append(seg, len(doc_of)))
    votes = 2 * ones - n_tok[:, None]
    weights = np.int64(1) << np.arange(32, dtype=np.int64)
    out[doc_of[seg]] = ((votes > 0) * weights).sum(axis=1)
    return out


def _alnum_run_count_fn(lowered: pd.Series) -> pd.Series:
    """Count of maximal ``[a-z0-9]+`` runs per ALREADY-LOWERCASED string —
    the value of ``size(filter(split(s, '[^a-z0-9]+'), t != ''))`` exactly:
    the regex split's pieces are the maximal alnum runs (leading/trailing/
    empty pieces are filtered), so counting run starts over the character
    class is the same number with no regex engine involved.

    Runs on the raw Arrow UTF-8 DATA BUFFER, never materializing
    per-row Python strings: the class is pure ASCII, and every byte of
    a multi-byte UTF-8 sequence is >= 0x80, so a byte-level mask is
    exactly the character-level mask. NULL propagates."""
    import pyarrow as pa

    arr = pa.Array.from_pandas(lowered, type=pa.large_string())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    off0 = offsets - offsets[0]
    buf = arr.buffers()[2]
    if buf is None or len(buf) == 0:
        counts = np.zeros(len(arr), dtype=np.int64)
    else:
        data = np.frombuffer(buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
        alnum = ((data >= 97) & (data <= 122)) | ((data >= 48) & (data <= 57))
        starts = alnum.copy()
        starts[1:] &= ~alnum[:-1]
        # a run must start fresh at each string boundary
        first = off0[:-1][off0[:-1] < len(data)]
        starts[first] = alnum[first]
        cs = np.concatenate(([0], np.cumsum(starts)))
        counts = cs[off0[1:]] - cs[off0[:-1]]
    out = pd.Series(counts, index=lowered.index, dtype="Int32")
    out[lowered.isna()] = pd.NA
    return out


def regex_token_count_kernel(lowered_col: Column) -> Column:
    """Arrow twin of ``size(text_funcs.regex_tokens(col))`` taking the
    ALREADY-LOWERED text column (``F.lower(col)`` stays in the JVM, so
    no second lowercase implementation enters the contract).

    Why a kernel for a count: evaluating the regex-split tokenizer
    (``split(lower(text), '[^a-z0-9]+')``) in the same Spark job as the
    PII ``regexp_extract_all``/``regexp_replace`` family measured a
    ~10× pathological slowdown of BOTH (500k docs: n_re alone 0.8 s,
    PII+md5 alone 1.9 s, together 18.5-26.7 s; separate projections do
    not help — JVM-global java.util.regex interference, see
    OPTIMIZATION_r13.md §text_stats). Counting codepoint-class runs in
    numpy computes the identical value with no java regex at all
    (equivalence pinned in tests/test_text_kernels.py)."""
    if "nre" not in _UDF_CACHE:
        _UDF_CACHE["nre"] = pandas_udf("int")(_alnum_run_count_fn)
    return _UDF_CACHE["nre"](lowered_col)


def _fingerprint256_fn(texts: pd.Series) -> pd.Series:
    # NULL text must stay NULL (the Catalyst spec and the DuckDB oracle
    # both propagate it); only non-null rows enter the kernel
    mask = texts.notna()
    out = pd.Series([pd.NA] * len(texts), dtype="Int64")
    if mask.any():
        prefixes = texts[mask].str.slice(0, 256)
        out[mask] = _rolling_hash_np(prefixes.tolist(), M_FINGERPRINT)
    return out


def _simhash32_fn(texts: pd.Series) -> pd.Series:
    mask = texts.notna()
    out = pd.Series([pd.NA] * len(texts), dtype="Int64")
    if mask.any():
        out[mask] = _simhash_np(texts[mask].tolist())
    return out


# pandas_udf registration needs an active SparkSession (PySpark 4), so the
# UDFs are built lazily on first use, then cached
_UDF_CACHE: dict[str, object] = {}


def _udf(name: str, fn):
    if name not in _UDF_CACHE:
        _UDF_CACHE[name] = pandas_udf("long")(fn)
    return _UDF_CACHE[name]


def fingerprint256_kernel(col: Column | str) -> Column:
    """Arrow twin of ``text_funcs.rolling_hash(substring(col, 1, 256))``."""
    return _udf("fp", _fingerprint256_fn)(col)


def simhash32_kernel(col: Column | str) -> Column:
    """Arrow twin of ``text_funcs.simhash32(col)``."""
    return _udf("sim", _simhash32_fn)(col)


# -- text normalization (the pre-tokenization cleaning pass) ---------------
#
# Fixed transformation chain, defined ONCE here and mirrored verbatim in
# NORMALIZE_SQL (DuckDB): NFC unicode normalization, CRLF->LF, control
# strip (keep \t \n), horizontal-whitespace collapse, space-trim around
# newlines, outer space trim. Patterns stay in the common subset of
# Python re and RE2 so both engines compile them identically.

_NORM_STEPS = (
    (r"\r\n", "\n"),
    (r"[\x00-\x08\x0b-\x1f\x7f]", ""),
    (r"[ \t]+", " "),
    (r" *\n *", "\n"),
)


def _normalize_fn(texts: pd.Series) -> pd.Series:
    import unicodedata

    mask = texts.notna()
    out = pd.Series([None] * len(texts), dtype="object")
    if mask.any():
        s = texts[mask].map(lambda t: unicodedata.normalize("NFC", t))
        for pat, rep in _NORM_STEPS:
            s = s.str.replace(pat, rep, regex=True)
        out[mask] = s.str.strip(" ")
    return out


def normalize_text_kernel(col: Column | str) -> Column:
    """Arrow-batched text normalization (NFC needs Python's unicodedata —
    Spark has no built-in NFC; everything else rides along in the same
    vectorized pass). NULL propagates."""
    if "norm" not in _UDF_CACHE:
        _UDF_CACHE["norm"] = pandas_udf("string")(_normalize_fn)
    return _UDF_CACHE["norm"](col)


def normalize_text_sql(col: str) -> str:
    """The identical chain as DuckDB SQL (nfc_normalize + RE2 global
    regexp_replace) — lockstep twin of ``normalize_text_kernel``. The
    replacement steps are spelled with escaped pattern literals (RE2
    resolves ``\\r``/``\\n``/``\\x..`` inside the pattern, so the SQL
    string needs no raw control bytes)."""
    expr = f"nfc_normalize({col})"
    steps_sql = (
        ("'\\r\\n'", "chr(10)"),
        ("'[\\x00-\\x08\\x0b-\\x1f\\x7f]'", "''"),
        ("'[ \\t]+'", "' '"),
        ("' *\\n *'", "chr(10)"),
    )
    for pat, rep in steps_sql:
        expr = f"regexp_replace({expr}, {pat}, {rep}, 'g')"
    return f"trim({expr}, ' ')"
