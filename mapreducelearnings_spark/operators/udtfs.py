"""Python UDTF surface (Spark 4 `@udtf`) — the table-function member of
the §2.9 UDF family (scalar pandas UDF / grouped-agg UDAF / mapInPandas
UDTF / cogroup-applyInPandas already covered elsewhere).

A class-based UDTF is the LATERAL-join-shaped escape hatch: one input
row → N output rows with per-row Python logic, registered into the SQL
catalog and callable from `FROM ... , LATERAL fn(...)`. It executes
row-at-a-time in Python — the SLOW path, kept (like
``operators/rdd_parity``) as API parity + a semantics twin, while the
hot path for the same computation is the pure-codegen regexp split in
``pipeline/textstats.sentence_stats``. When per-row Python is genuinely
needed at scale, prefer the Arrow-batched ``mapInPandas``/``mapInArrow``
paths in ``pipeline/multimodal``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

_TERMINALS = re.compile(r"[.!?]+")


@udtf(returnType="doc_id bigint, sentence_idx bigint, sentence string, n_words bigint")
class SentenceSplitUDTF:
    """Split a document into sentences on terminal-punctuation runs
    (same contract as textstats.sentence_stats: chunks trimmed, empties
    dropped), emitting one row per kept sentence with its 0-based
    ordinal and whitespace-token word count."""

    def eval(self, doc_id: int, text: str):  # noqa: D102 (UDTF contract)
        if text is None:
            return
        idx = 0
        for chunk in _TERMINALS.split(text):
            s = chunk.strip()
            if s:
                yield doc_id, idx, s, len(s.split())
                idx += 1


def sentence_split_lateral(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Register the UDTF and apply it LATERAL-style over ``docs``."""
    spark.udtf.register("sentence_split_udtf", SentenceSplitUDTF)
    return spark.sql(
        "SELECT s.doc_id, s.sentence_idx, s.sentence, s.n_words "
        "FROM {d} d, LATERAL sentence_split_udtf(d.doc_id, d.text) s",
        d=docs,
    )
