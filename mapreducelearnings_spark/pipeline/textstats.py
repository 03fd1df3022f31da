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


def cooccurrence_pairs(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Windowed word co-occurrence with exact PMI-lift — the canonical
    MapReduce "pairs" pattern (Lin & Dyer ch.3; the reference's
    follower-count generalized from unigrams to skip-gram pairs):
    for every token x at position i, pair it with each DISTINCT-order
    neighbor y in positions (i+1 .. i+window] of the same document,
    normalize to an unordered pair (least, greatest), drop self-pairs,
    and count corpus-wide.  lift = p(x,y) / (p(x)·p(y)) expressed as
    ((((c_xy·Nw)·Nw)/Np)/c_x)/c_y in EXACTLY that IEEE association
    order, so DuckDB reproduces it bit-for-bit (every operand is an
    exact int64; each double op is correctly rounded — no libm, no
    order-dependent float sum).  PMI itself is log(lift): monotone, so
    ranking/thresholding on lift is ranking on PMI without putting a
    cross-engine log in the oracle.

    Shape at 100 TB: the pair generation is a map-side expand (one
    posexplode + one bounded slice-explode, ~window rows per token —
    no shuffle), followed by ONE partial+final aggregate on the pair
    key.  The two unigram joins key on single words; vocabulary is
    sublinear in corpus size and AQE picks broadcast when it fits —
    no forced broadcast here because a 100 TB crawl's junk vocabulary
    can exceed driver memory.  The two scalar totals ride in as 1-row
    broadcast cross-joins.  Skew note: stopword pairs are the heavy
    keys, but they arrive PRE-AGGREGATED map-side (partial
    HashAggregate), so the shuffle carries one row per (pair,
    partition) — the pairs pattern's whole point vs raw emission.
    """
    toks = docs.select(X.tokens(text_col).alias("ts"))
    pos = toks.select(F.posexplode("ts").alias("i", "x"), "ts")
    # posexplode's i is 0-based; F.slice is 1-based => next token sits
    # at slice start i+2. slice clamps at the array end like DuckDB's
    # list_slice.
    pairs = pos.select(
        "x",
        F.explode(F.slice("ts", F.col("i") + F.lit(2), window)).alias("y"),
    ).where(F.col("x") != F.col("y"))
    und = pairs.select(
        F.least("x", "y").alias("w1"), F.greatest("x", "y").alias("w2")
    )
    cxy = und.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c_xy")
    )
    uni = toks.select(F.explode("ts").alias("w"))
    cw = uni.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = uni.agg(F.count(F.lit(1)).cast("long").alias("nw")).crossJoin(
        F.broadcast(und.agg(F.count(F.lit(1)).cast("long").alias("np")))
    )
    a = cw.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    b = cw.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    out = (
        cxy.where(F.col("c_xy") >= min_count)
        .join(a, "w1")
        .join(b, "w2")
        .crossJoin(F.broadcast(totals))
    )
    lift = (
        F.col("c_xy").cast("double")
        * F.col("nw")
        * F.col("nw")
        / F.col("np")
        / F.col("c_x")
        / F.col("c_y")
    )
    return out.select("w1", "w2", "c_xy", "c_x", "c_y", lift.alias("lift"))


def cooccurrence_pairs_stripes(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """The STRIPES physical strategy for the same co-occurrence
    contract as :func:`cooccurrence_pairs` (Lin & Dyer ch.3's other
    half): instead of shuffling one row per (pair, partition), each
    anchor word aggregates a per-word map {neighbor -> count}
    (map_from_entries over a grouped collect), and maps merge in the
    reduce. On Spark this buys nothing — the pairs path's partial
    HashAggregate already does map-side combining, which is the whole
    problem stripes existed to solve on Hadoop MR, and the stripes
    aggregate is an ObjectHashAggregate carrying fat map values with a
    per-key memory bound of O(vocabulary). Kept as the documented
    strategy twin (same role as the 4 xByKey follower-count twins):
    pytest pins output equality with the pairs path, and the docstring
    pins the recommendation — use pairs on Spark.
    """
    toks = docs.select(X.tokens(text_col).alias("ts"))
    pos = toks.select(F.posexplode("ts").alias("i", "x"), "ts")
    pairs = pos.select(
        "x",
        F.explode(F.slice("ts", F.col("i") + F.lit(2), window)).alias("y"),
    ).where(F.col("x") != F.col("y"))
    und = pairs.select(
        F.least("x", "y").alias("w1"), F.greatest("x", "y").alias("w2")
    )
    # stripe = per-w1 neighbor map; counts live in the map values
    stripes = (
        und.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("w1")
        .agg(
            F.map_from_entries(
                F.sort_array(F.collect_list(F.struct("w2", "c")))
            ).alias("stripe")
        )
    )
    flat = stripes.select(
        "w1", F.explode("stripe").alias("w2", "c_xy")
    ).where(F.col("c_xy") >= min_count)
    uni = toks.select(F.explode("ts").alias("w"))
    cw = uni.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = uni.agg(F.count(F.lit(1)).cast("long").alias("nw")).crossJoin(
        F.broadcast(und.agg(F.count(F.lit(1)).cast("long").alias("np")))
    )
    a = cw.select(F.col("w").alias("w1"), F.col("c").alias("c_x"))
    b = cw.select(F.col("w").alias("w2"), F.col("c").alias("c_y"))
    out = flat.join(a, "w1").join(b, "w2").crossJoin(F.broadcast(totals))
    lift = (
        F.col("c_xy").cast("double")
        * F.col("nw")
        * F.col("nw")
        / F.col("np")
        / F.col("c_x")
        / F.col("c_y")
    )
    return out.select("w1", "w2", "c_xy", "c_x", "c_y", lift.alias("lift"))
