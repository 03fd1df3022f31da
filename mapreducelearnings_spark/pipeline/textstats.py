"""Document-level text analysis (SURVEY.md §2.11): token counting,
quality scoring, language-ID heuristic, order-sensitive fingerprinting.
All pure column expressions with bit-exact DuckDB twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token_count, char_count, punct_count, stop_count,
    quality_score). Quality heuristic (deterministic, documented so the
    oracle can recompute it):
    0.5·min(tokens/100, 1) + 0.3·stopword_ratio + 0.2·(1 − punct_ratio).
    """
    toks = X.tokens(text_col)
    tc = F.size(toks).cast("long")
    cc = F.length(F.col(text_col)).cast("long")
    pc = X.punct_count(text_col)
    sc = X.stopword_count(toks, X.STOPWORDS_EN)
    quality = (
        0.5 * F.least(tc.cast("double") / 100.0, F.lit(1.0))
        + 0.3 * (sc.cast("double") / F.greatest(tc, F.lit(1)).cast("double"))
        + 0.2
        * (1.0 - pc.cast("double") / F.greatest(cc, F.lit(1)).cast("double"))
    )
    return docs.select(
        "doc_id",
        tc.alias("token_count"),
        cc.alias("char_count"),
        pc.alias("punct_count"),
        sc.alias("stop_count"),
        F.round(quality, 4).alias("quality_score"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-family language ID: argmax of per-language stopword hits
    with deterministic tiebreak en > fr > de, 'und' (undetermined) when
    no stopword matches at all."""
    toks = X.tokens(text_col)
    en = X.stopword_count(toks, X.STOPWORDS_EN)
    fr = X.stopword_count(toks, X.STOPWORDS_FR)
    de = X.stopword_count(toks, X.STOPWORDS_DE)
    pred = (
        F.when((en == 0) & (fr == 0) & (de == 0), "und")
        .when((en >= fr) & (en >= de), "en")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return docs.select(
        "doc_id",
        en.alias("en_hits"),
        fr.alias("fr_hits"),
        de.alias("de_hits"),
        pred.alias("lang_pred"),
    )


QF_MIN_QUALITY = 0.55
QF_MIN_TOKENS = 20
QF_LANG = "en"


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = QF_MIN_QUALITY,
    min_tokens: int = QF_MIN_TOKENS,
    lang: str = QF_LANG,
) -> DataFrame:
    """The end-to-end training-data keep/drop gate: quality score AND
    language AND length computed in ONE scan (tokens materialized into a
    column first — an expression captured inside the HOF stopword
    filters would re-evaluate the regexp split per element), then
    filtered. Returns the kept docs as (doc_id, token_count,
    quality_score, lang_pred).

    At 100 TB this is the canonical first pass over a crawl: pure
    codegen expressions, no shuffle at all — the filter runs at scan
    speed and prunes before any downstream dedup/embedding stage."""
    toks = F.col("_toks")
    tc = F.size(toks).cast("long")
    cc = F.length(F.col(text_col)).cast("long")
    pc = X.punct_count(text_col)
    en = X.stopword_count(toks, X.STOPWORDS_EN)
    fr = X.stopword_count(toks, X.STOPWORDS_FR)
    de = X.stopword_count(toks, X.STOPWORDS_DE)
    quality = (
        0.5 * F.least(tc.cast("double") / 100.0, F.lit(1.0))
        + 0.3 * (en.cast("double") / F.greatest(tc, F.lit(1)).cast("double"))
        + 0.2
        * (1.0 - pc.cast("double") / F.greatest(cc, F.lit(1)).cast("double"))
    )
    pred = (
        F.when((en == 0) & (fr == 0) & (de == 0), "und")
        .when((en >= fr) & (en >= de), "en")
        .when(fr >= de, "fr")
        .otherwise("de")
    )
    return (
        docs.withColumn("_toks", X.tokens(text_col))
        .select(
            "doc_id",
            tc.alias("token_count"),
            F.round(quality, 4).alias("quality_score"),
            pred.alias("lang_pred"),
        )
        .where(
            (F.col("quality_score") >= min_quality)
            & (F.col("token_count") >= min_tokens)
            & (F.col("lang_pred") == lang)
        )
    )


def sentence_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_sentences, words_per_sentence): sentence segmentation
    by terminal-punctuation runs ([.!?]+) with empty chunks dropped —
    the document-structure signal quality classifiers use next to the
    token counts. Pure codegen regexp split, zero shuffles."""
    chunks = F.split(F.col(text_col), r"[.!?]+")
    n_sent = F.size(
        F.filter(chunks, lambda s: F.trim(s) != "")
    ).cast("long")
    n_words = F.size(X.tokens(text_col)).cast("long")
    return docs.select(
        "doc_id",
        n_sent.alias("n_sentences"),
        F.when(
            n_sent > 0,
            F.round(n_words.cast("double") / n_sent, 4),
        ).alias("words_per_sentence"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint): order-sensitive rolling hash (see
    functions.text.rolling_fingerprint)."""
    return docs.select(
        "doc_id", X.rolling_fingerprint(X.tokens(text_col)).alias("fingerprint")
    )
