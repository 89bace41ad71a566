"""Text-analysis operators for large-scale training-data pipelines.

Language-ID, quality scoring, token counting, and document fingerprinting
over a document table — all pure Catalyst expressions from
functions/text_funcs.py (no UDFs: the whole operator is one codegen stage
over the scan, embarrassingly parallel, zero shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datalake_public_spark.functions import text_funcs as T
from datalake_public_spark.sources.readers import widen_for_compute


def token_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace + BPE-ish token counts and byte/char lengths."""
    toks = T.tokens(text_col)
    rtoks = T.regex_tokens(text_col)
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        F.octet_length(F.col(text_col)).alias("n_bytes"),
        F.size(toks).alias("n_ws_tokens"),
        F.size(rtoks).alias("n_re_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: argmax hits over LANG_MARKERS,
    alphabetical tie-break, 'und' on zero hits."""
    return docs.select(
        F.col(id_col),
        T.language_id(text_col).alias("pred_lang"),
        *[T.lang_hits(text_col, lang).alias(f"hits_{lang}") for lang in T.LANG_MARKERS],
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristics: lexical diversity, mean token
    length, and a blended 0-1 score. Formulas mirrored exactly in the
    driver oracle — change both together."""
    toks = T.tokens(text_col)
    n = F.size(toks)
    uniq_ratio = F.size(F.array_distinct(toks)) / n
    mean_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / n
    score = 0.5 * uniq_ratio + 0.5 * (1.0 - F.least(F.abs(mean_tok_len - 5.0) / 10.0, F.lit(1.0)))
    return docs.select(
        F.col(id_col),
        F.col("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(uniq_ratio, 4).alias("uniq_ratio"),
        F.round(mean_tok_len, 4).alias("mean_tok_len"),
        F.round(score, 4).alias("quality"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Rolling-hash document fingerprint (first 256 chars) + 32-bit simhash.
    Both engine-portable modular arithmetic (functions/text_funcs.py)."""
    prefix = F.substring(F.col(text_col), 1, 256)
    return widen_for_compute(docs).select(
        F.col(id_col),
        T.rolling_hash(prefix).alias("fingerprint"),
        T.simhash32(text_col).alias("simhash"),
    )
