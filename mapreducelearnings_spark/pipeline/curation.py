"""End-to-end corpus curation (SURVEY.md §2.11 — NEW layer; no
reference counterpart): the composed pass a training-data pipeline runs
over a crawl before tokenization, built entirely from this engine's own
layers so every stage's scale story is already proven in isolation:

1. **quality gate** (:func:`..pipeline.textstats.quality_filter`) —
   quality ∧ length ∧ language in one codegen scan, zero shuffles;
   prunes the crawl BEFORE any pairwise work exists.
2. **exact dedup** (content-hash groupBy, keep min doc_id) — one
   shuffle on a 128-bit key over the ~36% survivors.
3. **near-dup dedup** (MinHash+LSH candidate pairs →
   :func:`..operators.graph.connected_components` → keep each
   cluster's min doc_id) — the only pairwise stage, and it is an
   equi-join on band signatures, never O(n²).

Stage order IS the 100 TB design: each stage shrinks the corpus the
next (more expensive) stage sees — the gate runs at scan speed on
everything, the hash dedup shuffles only gated survivors, and LSH
shingling/banding runs only on exact-unique documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import graph as G
from . import dedup as DD
from . import textstats as TS

# r14 optimization (guide §2.4/§5, same pattern as simsearch._pin):
# the three curation stages each feed TWO consumers (the gate: id join
# + final stats join; the gated narrow rows: hash dedup + exact-unique
# join), and Catalyst shares no subtrees across branches, so the
# unpinned plan replayed the quality gate ~3x and the md5 dedup twice.
# Toggle exists for A/B measurement only.
_PIN_REUSED = True


def _pin(df: DataFrame) -> DataFrame:
    """See simsearch._pin — including the library-consumer note on
    releasing accumulated pinned blocks in long-lived sessions
    (ADVICE r14)."""
    if not _PIN_REUSED:
        return df
    from pyspark.storagelevel import StorageLevel

    return df.persist(StorageLevel.MEMORY_AND_DISK)


def curate_corpus(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Returns the curated keep-set as (doc_id, token_count,
    quality_score) — the documents that survive gate → exact-dedup →
    near-dup-cluster-dedup, with the stats a downstream token-budget
    planner needs. Keep policy at every dedup stage: lowest doc_id
    survives (deterministic, and the component label of the union-find
    is already the min member, so near-dup survivors are exactly the
    rows where vertex == component)."""
    kept = _pin(TS.quality_filter(docs))
    # narrow the gated rows to what downstream reads (doc_id, text) —
    # the near-dup stage shingles text, the survivor joins use ids only
    dk = _pin(
        docs.select("doc_id", "text").join(kept.select("doc_id"), "doc_id")
    )
    exact_keep = (
        dk.groupBy(F.md5("text").alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    de = dk.join(exact_keep, "doc_id")
    pairs = DD.lsh_candidate_pairs(de)
    cc = G.connected_components(
        spark,
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    # docs in no pair never enter cc and survive via the anti-join
    dropped = cc.where(F.col("vertex") != F.col("component")).select(
        F.col("vertex").alias("doc_id")
    )
    survivors = de.select("doc_id").join(dropped, "doc_id", "left_anti")
    return survivors.join(kept, "doc_id").select(
        "doc_id", "token_count", "quality_score"
    )
