"""Corpus sampling & decontamination (SURVEY.md §2.11 — NEW layer):
the two remaining curation levers a training-data pipeline applies after
dedup — re-weighting the language/domain MIX, and removing documents
that leak evaluation benchmarks.

Both are deterministic by construction (md5-derived decisions, identical
in DuckDB), so despite being "sampling" they are fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as X

# Per-stratum keep rates (language mixing weights). Missing strata keep
# nothing — an explicit allowlist, the safe default for a training mix.
SAMPLE_RATES: dict[str, float] = {
    "en": 1.0,
    "de": 0.5,
    "fr": 0.5,
    "es": 0.25,
    "zh": 0.25,
}
SAMPLE_MOD = 10_000


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float] | None = None,
    key_col: str = "lang",
    id_col: str = "doc_id",
    extra_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Deterministic stratified downsample: keep a row iff
    md5(id) mod 10000 < rate[stratum]·10000. One codegen scan, zero
    shuffles, no RNG — the same document is kept or dropped on every
    run and on every engine, which is what makes the training mix
    reproducible (and the oracle checkable). At 100 TB this runs as a
    filter fused into the ingest scan; changing the mix is a constant
    change, not a new shuffle. ``extra_cols`` are passed through the
    projection (default keeps ``source`` for the registered documents
    query); pass ``()`` for frames that lack it."""
    rates = rates if rates is not None else SAMPLE_RATES
    u = X.md5_long(F.col(id_col).cast("string")) % SAMPLE_MOD
    thr = F.lit(0)
    for k, r in rates.items():
        thr = F.when(F.col(key_col) == k, F.lit(int(r * SAMPLE_MOD))).otherwise(
            thr
        )
    return docs.select(
        id_col, key_col, *extra_cols, u.alias("u")
    ).where(F.col("u") < thr)


# Decontamination: flag corpus documents sharing any long word-shingle
# with the benchmark set. 8-gram shingles — long enough that accidental
# collision is negligible, the standard eval-leak heuristic.
DECON_N = 8
DECON_BENCH_MAX_ID = 20
DECON_THRESHOLD = 1


def contamination_flags(
    docs: DataFrame,
    n: int = DECON_N,
    bench_max_id: int = DECON_BENCH_MAX_ID,
    threshold: int = DECON_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_overlap, contaminated) for every non-benchmark doc:
    n_overlap = distinct ``n``-gram shingles shared with the benchmark
    set (here: doc_id < ``bench_max_id`` stands in for the eval suite).

    Scale shape: the benchmark shingle set is SMALL (eval suites are
    thousands of docs) → broadcast; the corpus side is one explode at
    scan speed; the probe is a broadcast hash join followed by one
    groupBy on doc_id. The corpus is never self-joined."""
    toks = docs.select("doc_id", X.tokens(text_col).alias("ts"))
    sh = toks.select(
        "doc_id", F.explode(X.word_shingles(F.col("ts"), n)).alias("sh_n")
    )
    bench = (
        sh.where(F.col("doc_id") < bench_max_id).select("sh_n").distinct()
    )
    corpus = sh.where(F.col("doc_id") >= bench_max_id)
    hits = (
        corpus.join(F.broadcast(bench), "sh_n")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh_n").alias("n_overlap"))
    )
    base = docs.where(F.col("doc_id") >= bench_max_id).select("doc_id")
    return base.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        (F.coalesce(F.col("n_overlap"), F.lit(0)) >= threshold).alias(
            "contaminated"
        ),
    )


# Priority sampling (Duffield/Lund/Thorup JACM'07): priority q = w/u,
# u ~ Uniform(0,1]; top-k by q is a weighted sample without replacement.
PRIO_MOD = 1 << 20


def priority_sample(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    mod: int = PRIO_MOD,
) -> DataFrame:
    """Deterministic weighted top-k sample: u is md5-derived (no RNG),
    priority = weight/u is ONE IEEE division of exactly-representable
    integers — bit-identical across engines and runs, so the sample is
    auditable and the ORDER BY boundary is deterministic. Plan: scan →
    TakeOrderedAndProject, zero shuffles. Output keeps the raw
    ``priority`` column quantized to 4 decimals via IEEE floor
    arithmetic (the cross-engine-exact rounding form)."""
    from ..functions import text as X

    u = (X.md5_long(F.col(id_col).cast("string")) % mod).alias("_u")
    w = docs.select(id_col, weight_col, u)
    priority = (F.col(weight_col) * (2 * mod)).cast("double") / (
        F.col("_u") * 2 + 1
    ).cast("double")
    return (
        w.select(id_col, weight_col, priority.alias("_pri"))
        .orderBy(F.col("_pri").desc(), id_col)
        .limit(k)
        .select(
            id_col,
            weight_col,
            (F.floor(F.col("_pri") * 10000 + 0.5) / 10000).alias("priority"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle + hash split (round 7; tests-only
# capabilities — no registry slot needed, the rotation is at capacity)
# ---------------------------------------------------------------------------


def epoch_shuffle(
    docs: DataFrame,
    epoch: int,
    id_col: str = "doc_id",
    n_shards: int | None = None,
) -> DataFrame:
    """Deterministic global shuffle for one training epoch: every row
    gets a pseudo-random order key derived from md5(id || epoch) — a
    different but REPRODUCIBLE permutation per epoch, no RNG state, no
    driver involvement. Returns the input plus ``shuffle_key``; callers
    write with ``repartitionByRange(n_shards, shuffle_key)`` +
    ``sortWithinPartitions`` so each output shard is a contiguous,
    globally-unbiased slice — the ONE total-ordering pattern that never
    funnels 100 TB through a single-partition global sort (range
    partitioning samples boundaries, then shards sort independently).
    ``n_shards`` applies that layout here when given; leave None to
    keep the plan shuffle-free and let the writer choose.
    """
    key = X.md5_long(
        F.concat_ws("#", F.col(id_col).cast("string"), F.lit(str(epoch)))
    ).alias("shuffle_key")
    out = docs.select("*", key)
    if n_shards:
        out = out.repartitionByRange(n_shards, "shuffle_key")
    return out


SPLIT_MOD = 1_000_000


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(id || salt) mod M
    falls into cumulative weight brackets. Properties a training
    pipeline needs and RNG-based splits lose: stable under reruns AND
    under corpus growth (a document's split never changes when other
    documents arrive — the decision depends only on its own id), and
    map-only (zero shuffles). Weights must sum to ≤ 1; any remainder
    is assigned to the LAST split (so {"train": .9, "val": .05,
    "test": .05} is exact). Returns the input plus ``split``.
    """
    if not weights or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative and non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError("weights must sum to at most 1")
    u = X.md5_long(
        F.concat_ws("#", F.col(id_col).cast("string"), F.lit(salt))
    ) % SPLIT_MOD
    names = list(weights)
    expr, acc = None, 0.0
    for name in names[:-1]:
        acc += weights[name]
        cond = u < int(acc * SPLIT_MOD)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(names[-1])
    return docs.select("*", split.alias("split"))
