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


# -- whole-row token/PII statistics kernel (round 13) -----------------------
#
# The text_stats driver entry computes 12 per-doc signals. Even with the
# staged-HOF evaluation (operators/text.py signal_stage1_cols) the JVM
# path keeps two structural costs: interpreted HOF token/gram passes, and
# the java-regex PII family whose coexistence with other regex workloads
# measured a JVM-global ~10× interference (see regex_token_count_kernel).
# This kernel computes ALL signals in one Arrow batch pass (guide-§4.2
# shape: Spark does distribution+scan, the batch goes to vectorized
# native code): token/gram/uniq/modal math on the Arrow buffers via
# numpy + dictionary_encode, PII via pyarrow's RE2 (the SAME engine the
# DuckDB oracle twins run, with patterns pinned Java≡RE2-identical since
# round 2), md5 via hashlib over the redacted buffer. The staged
# Catalyst form remains the oracle-checkable spec; equality is pinned in
# tests/test_text_kernels.py on edge cases + real corpora.

#: scale for int_ratio_half_up(…, 6) in the kernel's integer math
_RATIO6 = 1_000_000


def _int_ratio(
    numer: np.ndarray, denom: np.ndarray, digits: int = 6
) -> np.ndarray:
    """functions/arith.int_ratio_half_up twin over int64 arrays, 0.0
    where denom == 0 (callers either coalesce to 0.0 like the Catalyst
    form, or re-mask those rows to null for the un-coalesced ratios)."""
    scale = 10**digits
    numer = numer.astype(np.int64)
    denom = denom.astype(np.int64)
    safe = np.maximum(denom, 1)
    q = (2 * scale * numer + denom) // (2 * safe)
    return np.where(denom > 0, q / float(scale), 0.0)


def _int_ratio6(numer: np.ndarray, denom: np.ndarray) -> np.ndarray:
    return _int_ratio(numer, denom, 6)


def _token_gram_stats(
    tokens_list, *, concat_len: bool = False, markers_by_lang: dict | None = None
) -> tuple:
    """Per-doc (n_ws_tokens, n_uniq, n_grams, n_dup_grams, modal_best)
    from an Arrow ListArray of space-split pieces (empties included —
    filtered here). Exact string identity via dictionary_encode; all
    per-doc reductions are numpy segment ops, no per-row Python.

    ``concat_len`` appends the per-doc sum of token codepoint lengths
    (== ``length(concat_ws('', toks))``); ``markers_by_lang`` appends a
    per-doc (n × len(markers_by_lang)) marker-hit count matrix in dict
    order (== ``size(filter(toks, isin(markers)))`` per language) —
    the extra signals text_lang_quality needs (round 14)."""
    n = len(tokens_list)
    offsets = np.frombuffer(tokens_list.buffers()[1], dtype=np.int32)[
        tokens_list.offset : tokens_list.offset + n + 1
    ].astype(np.int64)
    counts_all = np.diff(offsets)
    values = tokens_list.flatten()  # honors offset/length
    import pyarrow as pa
    import pyarrow.compute as pc

    nonempty = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    nonempty = np.asarray(nonempty, dtype=bool)
    doc_at = np.repeat(np.arange(n, dtype=np.int64), counts_all)[nonempty]
    denc = pc.dictionary_encode(values)
    codes = np.asarray(
        denc.indices.to_numpy(zero_copy_only=False),
        dtype=np.int64,
    )[nonempty]
    extras: list = []
    if concat_len:
        tok_lens = np.asarray(
            pc.utf8_length(values).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )[nonempty]
        cs = np.zeros(n, dtype=np.int64)
        np.add.at(cs, doc_at, tok_lens)
        extras.append(cs)
    if markers_by_lang is not None:
        hits = np.zeros((n, len(markers_by_lang)), dtype=np.int64)
        if len(codes):
            dictionary = denc.dictionary
            for li, markers in enumerate(markers_by_lang.values()):
                mc = pc.index_in(
                    pa.array(list(markers), type=dictionary.type),
                    value_set=dictionary,
                )
                mcn = np.asarray(
                    [m for m in mc.to_pylist() if m is not None],
                    dtype=np.int64,
                )
                if len(mcn):
                    mask = np.isin(codes, mcn)
                    np.add.at(hits[:, li], doc_at[mask], 1)
        extras.append(hits)
    n_toks = np.zeros(n, dtype=np.int64)
    np.add.at(n_toks, np.repeat(np.arange(n, dtype=np.int64), counts_all)[nonempty], 1)
    n_uniq = np.zeros(n, dtype=np.int64)
    best = np.zeros(n, dtype=np.int64)
    n_grams = np.maximum(n_toks - 1, 0)
    n_dup = np.zeros(n, dtype=np.int64)
    if len(codes):
        # distinct tokens + modal multiplicity: sort (doc, code), count
        # run boundaries / run lengths per doc
        order = np.lexsort((codes, doc_at))
        d_s, c_s = doc_at[order], codes[order]
        new_run = np.empty(len(c_s), dtype=bool)
        new_run[0] = True
        new_run[1:] = (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])
        run_starts = np.flatnonzero(new_run)
        np.add.at(n_uniq, d_s[run_starts], 1)
        run_lens = np.diff(np.append(run_starts, len(c_s)))
        np.maximum.at(best, d_s[run_starts], run_lens)
        # 2-gram distinct count: adjacent same-doc pairs in ORIGINAL
        # token order; pair identity = (code_i, code_{i+1})
        adj = doc_at[1:] == doc_at[:-1]
        if adj.any():
            K = int(codes.max()) + 1
            gdoc = doc_at[:-1][adj]
            gkey = codes[:-1][adj] * K + codes[1:][adj]
            gorder = np.lexsort((gkey, gdoc))
            gd, gk = gdoc[gorder], gkey[gorder]
            gnew = np.empty(len(gk), dtype=bool)
            gnew[0] = True
            gnew[1:] = (gd[1:] != gd[:-1]) | (gk[1:] != gk[:-1])
            n_distinct = np.zeros(n, dtype=np.int64)
            np.add.at(n_distinct, gd[np.flatnonzero(gnew)], 1)
            n_dup = n_grams - n_distinct
    return (n_toks, n_uniq, n_grams, n_dup, best, *extras)


def _md5_hex_per_row(arr) -> list:
    """md5 hexdigest of each string's UTF-8 bytes, None for null — reads
    the Arrow data buffer directly (no per-row Python strings)."""
    import hashlib

    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    buf = arr.buffers()[2]
    mv = memoryview(buf) if buf is not None else memoryview(b"")
    valid = np.ones(n, dtype=bool)
    if arr.null_count:
        import pyarrow.compute as pc

        valid = np.asarray(
            pc.is_valid(arr).to_numpy(zero_copy_only=False), dtype=bool
        )
    out: list = [None] * n
    md5 = hashlib.md5
    for i in range(n):
        if valid[i]:
            out[i] = md5(mv[offsets[i] : offsets[i + 1]]).hexdigest()
    return out


def _alnum_runs_from_arrow(arr) -> np.ndarray:
    """Byte-level alnum-run count per string of an Arrow string array
    (see _alnum_run_count_fn for the semantics proof)."""
    n = len(arr)
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    off0 = offsets - offsets[0]
    buf = arr.buffers()[2]
    if buf is None or offsets[-1] == offsets[0]:
        return np.zeros(n, dtype=np.int64)
    data = np.frombuffer(buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
    alnum = ((data >= 97) & (data <= 122)) | ((data >= 48) & (data <= 57))
    starts = alnum.copy()
    starts[1:] &= ~alnum[:-1]
    first = off0[:-1][off0[:-1] < len(data)]
    starts[first] = alnum[first]
    cs = np.concatenate(([0], np.cumsum(starts)))
    return cs[off0[1:]] - cs[off0[:-1]]


def text_stats_batches(pii_patterns: dict, pii_order: tuple):
    """mapInArrow kernel factory for the text_stats signal row: input
    batches of (doc_id, text, __lowered), output the full 13-column
    signal schema (TEXT_STATS_KERNEL_SCHEMA). NULL text → NULL counts,
    0.0 ratios, NULL md5 — exactly the Catalyst spec's null algebra."""

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            doc_id = batch.column(0)
            text = batch.column(1)
            if pa.types.is_large_string(text.type):
                text = text.cast(pa.string())
            low = batch.column(2)
            if pa.types.is_large_string(low.type):
                low = low.cast(pa.string())
            n = len(text)
            valid = np.ones(n, dtype=bool)
            if text.null_count:
                valid = np.asarray(
                    pc.is_valid(text).to_numpy(zero_copy_only=False), dtype=bool
                )
            nulls = ~valid
            n_chars = pc.utf8_length(text)
            n_bytes = pc.binary_length(text)
            pieces = pc.split_pattern(pc.fill_null(text, ""), " ")
            n_toks, n_uniq, n_grams, n_dup, best = _token_gram_stats(pieces)
            n_re = _alnum_runs_from_arrow(
                pc.fill_null(low, "").combine_chunks()
                if isinstance(low, pa.ChunkedArray)
                else pc.fill_null(low, "")
            )
            dup_frac = _int_ratio6(n_dup, n_grams)
            top_frac = _int_ratio6(best, n_toks)
            red = text
            for k in pii_order:
                red = pc.replace_substring_regex(
                    red, pattern=pii_patterns[k], replacement=f"[{k.upper()}]"
                )
            md5s = _md5_hex_per_row(
                red.combine_chunks() if isinstance(red, pa.ChunkedArray) else red
            )
            def _int_col(vals):
                a = pa.array(
                    np.asarray(vals, dtype=np.int64), type=pa.int64()
                ).cast(pa.int32())
                if nulls.any():
                    a = pc.if_else(pa.array(nulls), pa.nulls(n, pa.int32()), a)
                return a
            cols = [
                doc_id,
                n_chars.cast(pa.int32()),
                n_bytes.cast(pa.int32()),
                _int_col(n_toks),
                _int_col(n_re),
                _int_col(n_uniq),
                # n_grams is NOT null-masked: the spec's CASE falls to
                # ELSE [] on NULL tokens, so size() is 0, never NULL
                pa.array(n_grams.astype(np.int64), type=pa.int64()).cast(
                    pa.int32()
                ),
                pa.array(dup_frac, type=pa.float64()),
                pa.array(top_frac, type=pa.float64()),
                *[
                    pc.count_substring_regex(text, pattern=pii_patterns[k]).cast(
                        pa.int32()
                    )
                    for k in pii_order
                ],
                pa.array(md5s, type=pa.string()),
            ]
            yield pa.RecordBatch.from_arrays(
                cols,
                names=[
                    "doc_id", "n_chars", "n_bytes", "n_ws_tokens",
                    "n_re_tokens", "n_uniq_tokens", "n_grams",
                    "dup_ngram_frac", "top_token_frac", "n_emails", "n_ips",
                    "n_phones", "redacted_md5",
                ],
            )

    return fn


TEXT_STATS_KERNEL_SCHEMA = (
    "doc_id long, n_chars int, n_bytes int, n_ws_tokens int, "
    "n_re_tokens int, n_uniq_tokens int, n_grams int, "
    "dup_ngram_frac double, top_token_frac double, n_emails int, "
    "n_ips int, n_phones int, redacted_md5 string"
)


# -- whole-row language-ID + quality + drop-rule kernel (round 14) ----------
#
# text_lang_quality is the text_stats twin for the language/quality signal
# families: after the r13 staged-HOF fix it still paid the interpreted
# token/gram/marker-filter HOF passes in the JVM (~8.1-8.6 s isolated at
# ×100 vs text_stats' 1.4-2.5 s post-kernel). Same §4.2 shape: Spark does
# scan+distribution, one mapInArrow pass computes every signal from the
# Arrow buffers. The staged Catalyst form remains the oracle-checkable
# spec; equality pinned in tests/test_text_kernels.py.


def lang_quality_batches(
    lang_markers: dict, qf: dict
):
    """mapInArrow kernel factory for the text_lang_quality row: input
    batches of (doc_id, text, n_chars), output
    ``lang_quality_kernel_schema``. The table's stored ``n_chars``
    column passes through VERBATIM (the spec projects the table column,
    which is not the same expression as the ``length(text)`` the
    min-chars drop rule evaluates — the rule length is computed here
    from the text itself, exactly like the spec's ``_len``).

    ``lang_markers``: ordered {lang: (marker words…)} — dict order is
    the argmax tie-break order, exactly like the Catalyst CASE chain.
    ``qf``: the drop-rule thresholds {min_chars, min_tokens, max_dup,
    max_top, min_quality, langs}.

    Null algebra mirrors the spec: NULL text → hits/counts/ratios NULL,
    pred_lang 'und', every rule fires (coalesce(cond, TRUE)); zero-token
    docs → NULL digit-4 ratios (int_ratio_half_up's denom-0 NULL, not
    coalesced in quality_cols_bound), 0.0 repetition ratios (those ARE
    coalesced)."""
    langs_order = list(lang_markers)
    tag_chars = f"too_short_chars<{qf['min_chars']}"
    tag_tokens = f"too_short_tokens<{qf['min_tokens']}"
    allowed = frozenset(qf["langs"])

    def fn(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            doc_id = batch.column(0)
            text = batch.column(1)
            n_chars_tbl = batch.column(2)  # stored column, passed through
            if pa.types.is_large_string(text.type):
                text = text.cast(pa.string())
            n = len(text)
            valid = np.ones(n, dtype=bool)
            if text.null_count:
                valid = np.asarray(
                    pc.is_valid(text).to_numpy(zero_copy_only=False),
                    dtype=bool,
                )
            nulls = ~valid
            # the min-chars RULE length is computed from the text (the
            # spec's `_len = length(text)`), independent of the stored
            # n_chars column the output carries
            rule_len = pc.utf8_length(text)  # null-propagating
            n_chars_np = np.asarray(
                pc.fill_null(rule_len, 0).to_numpy(zero_copy_only=False),
                dtype=np.int64,
            )
            pieces = pc.split_pattern(pc.fill_null(text, ""), " ")
            n_toks, n_uniq, n_grams, n_dup, best, cs, hits = _token_gram_stats(
                pieces, concat_len=True, markers_by_lang=lang_markers
            )
            # repetition ratios: coalesced to 0.0 (spec)
            dup = _int_ratio(n_dup, n_grams, 6)
            top = _int_ratio(best, n_toks, 6)
            # digit-4 ratios: NULL where n_toks == 0 (un-coalesced spec)
            ratio_ok = (n_toks > 0) & valid
            uniq_ratio = _int_ratio(n_uniq, n_toks, 4)
            mean_tok_len = _int_ratio(cs, n_toks, 4)
            p_quality = (
                10 * n_uniq
                + 10 * n_toks
                - np.minimum(np.abs(cs - 5 * n_toks), 10 * n_toks)
            )
            quality = _int_ratio(p_quality, 20 * n_toks, 4)
            # pred_lang: argmax over dict order (first max wins — the
            # CASE chain's tie-break), 'und' on zero hits / null text
            mx = hits.max(axis=1) if hits.shape[1] else np.zeros(n, np.int64)
            arg = hits.argmax(axis=1) if hits.shape[1] else np.zeros(n, int)
            pred = np.where(
                (mx > 0) & valid,
                np.array(langs_order, dtype=object)[arg],
                "und",
            )
            # drop rules, fixed order; NULL predicate == violation
            v1 = nulls | (n_chars_np < qf["min_chars"])
            v2 = nulls | (n_toks < qf["min_tokens"])
            v3 = dup > qf["max_dup"]          # 0.0-coalesced, never null
            v4 = top > qf["max_top"]
            v5 = ~ratio_ok | (quality < qf["min_quality"])
            v6 = np.array([p not in allowed for p in pred], dtype=bool)
            reasons = [
                ",".join(
                    t
                    for t, v in (
                        (tag_chars, v1[i]),
                        (tag_tokens, v2[i]),
                        ("repetitive_ngrams", v3[i]),
                        ("modal_token_mass", v4[i]),
                        ("low_quality_score", v5[i]),
                        ("lang_not_allowed", v6[i]),
                    )
                    if v
                )
                for i in range(n)
            ]
            survives = ~(v1 | v2 | v3 | v4 | v5 | v6)

            def _int_col(vals):
                a = pa.array(
                    np.asarray(vals, dtype=np.int64), type=pa.int64()
                ).cast(pa.int32())
                if nulls.any():
                    a = pc.if_else(pa.array(nulls), pa.nulls(n, pa.int32()), a)
                return a

            def _ratio_col(vals):
                return pa.array(vals, type=pa.float64(), mask=~ratio_ok)

            cols = [
                doc_id,
                pa.array(pred, type=pa.string()),
                *[_int_col(hits[:, li]) for li in range(len(langs_order))],
                n_chars_tbl,
                _int_col(n_toks),
                _ratio_col(uniq_ratio),
                _ratio_col(mean_tok_len),
                _ratio_col(quality),
                pa.array(reasons, type=pa.string()),
                pa.array(survives),
            ]
            yield pa.RecordBatch.from_arrays(
                cols,
                names=[
                    "doc_id", "pred_lang",
                    *[f"hits_{lang}" for lang in langs_order],
                    "n_chars", "n_tokens", "uniq_ratio", "mean_tok_len",
                    "quality", "drop_reasons_csv", "survives",
                ],
            )

    return fn


def lang_quality_kernel_schema(lang_markers: dict) -> str:
    hits = ", ".join(f"hits_{lang} int" for lang in lang_markers)
    return (
        f"doc_id long, pred_lang string, {hits}, n_chars bigint, "
        "n_tokens int, uniq_ratio double, mean_tok_len double, "
        "quality double, drop_reasons_csv string, survives boolean"
    )


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
