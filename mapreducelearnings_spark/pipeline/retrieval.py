"""Keyword retrieval (SURVEY.md §2.11 — NEW layer): inverted index +
BM25 ranking over the documents table. The text-search complement to the
embedding ANN family — together they are the two retrieval modalities a
training-data pipeline curates against (keyword dedup/search + semantic
search).

Scale shape: the index build is explode → two partial-agg groupBys (the
same shuffle profile as the MinHash signature build); BM25 scoring for a
query touches only the postings of the query's terms (an equi-join on
token against a tiny broadcast term list), with corpus constants (N,
avg_len) riding a broadcast 1-row crossJoin — no driver-side count()
pass, one job end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

BM25_K1 = 1.2
BM25_B = 0.75
DEFAULT_QUERY = ["stream", "vector", "hash"]
BM25_TOP_N = 10


def inverted_index(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, df, postings): the classic inverted file. Postings are
    serialized as a sorted "doc_id:tf,doc_id:tf" string (the engine's
    array-compare convention, see grouped_collect) — in production this
    column is an array<struct> written bucketed by token so term lookups
    prune to one bucket."""
    tf = (
        docs.select("doc_id", F.explode(X.tokens(text_col)).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    return tf.groupBy("token").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
                lambda s: F.concat_ws(
                    ":", s.doc_id.cast("string"), s.tf.cast("string")
                ),
            ),
            ",",
        ).alias("postings"),
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    top_n: int = BM25_TOP_N,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
) -> DataFrame:
    """Top-N documents by BM25 for a bag of query terms:
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len_d/avg_len)),
    idf(t) = ln((N − df + 0.5)/(df + 0.5) + 1) (the Robertson/Sparck
    Jones form that never goes negative).

    Everything is one declarative plan: term frequencies for the query
    terms only (the filter prunes the explode before the shuffle), df
    per term (tiny — broadcast), N and avg_len as a broadcast 1-row
    aggregate, score as a codegen expression, top-N via
    TakeOrderedAndProject. Scores rounded to 6 dp before ranking so the
    ordering is reproducible cross-engine."""
    terms = query_terms or DEFAULT_QUERY
    toks = docs.select(
        "doc_id", F.size(X.tokens(text_col)).cast("long").alias("len_d"),
        F.explode(X.tokens(text_col)).alias("token"),
    )
    qt = toks.where(F.col("token").isin(terms))
    tf = qt.groupBy("doc_id", "token").agg(
        F.count(F.lit(1)).alias("tf"), F.first("len_d").alias("len_d")
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    consts = docs.select(
        F.size(X.tokens(text_col)).cast("double").alias("l")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("l").alias("avg_len"),
    )
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("len_d") / F.col("avg_len"))
                )
            ).alias("term_score"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(top_n)
        .select("doc_id", F.round("bm25", 4).alias("bm25"))
    )
