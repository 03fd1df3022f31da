"""Text-analysis column expressions (SURVEY.md §2.11 — NEW layer, no
reference counterpart; generalizes the reference's split/count pipeline,
ReduceByKey/src/main/scala/wc/FollowersCount.scala:26-28, to tokens).

Every expression here is a pure JVM-side column expression (no UDFs) and
has a bit-exact DuckDB twin, verified in tests/test_pipeline.py — the
hashes are built from md5 (identical in both engines), so even MinHash
signatures and rolling fingerprints are oracle-checkable.

Scale: whole-stage-codegen throughout; the only shuffle any consumer
needs is its own aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny deterministic stopword sets for the language-ID heuristic. The
# choice of words matters less than determinism — the lang_id oracle
# recomputes the same counts in SQL.
STOPWORDS_EN = ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"]
STOPWORDS_FR = ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"]
STOPWORDS_DE = ["der", "die", "das", "und", "ein", "ist", "zu", "den", "mit", "von"]

FINGERPRINT_MOD = 2_147_483_647  # 2^31 − 1; keeps the 31× fold in long range


def tokens(col: str | Column) -> Column:
    """Alphabetic tokens, lowercased. Deterministic and identical to
    DuckDB's regexp_extract_all(lower(x), '[a-z]+')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z]+"), 0)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_count(tokens_col: Column, words: list[str]) -> Column:
    """Stopword occurrences (with multiplicity)."""
    wordset = F.array(*[F.lit(w) for w in words])
    return F.size(
        F.filter(tokens_col, lambda t: F.array_contains(wordset, t))
    ).cast("long")


def punct_count(col: str | Column) -> Column:
    """Count of sentence punctuation characters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(F.regexp_replace(c, "[^.!?,;:]", "")).cast("long")


def md5_long(col: Column, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative long
    (≤ 60 bits). Bit-identical to DuckDB's
    ('0x' || substr(md5(x), 1, n))::UBIGINT."""
    return F.conv(F.substring(F.md5(col), 1, hex_chars), 16, 10).cast("long")


# Universal-hash family for MinHash: h_i(s) = (a_i·(md5(s) mod M) + b_i) mod M
# with Mersenne prime M = 2³¹−1. ONE md5 per shingle feeds all 16
# permutations via multiply-add (16× fewer md5 evaluations than salting
# md5 per permutation — the md5s dominated the LSH profile). a_i, b_i are
# md5-derived in Python and embedded as literals in both engines.
MINHASH_M = 2_147_483_647


def _perm_constants(n: int = 64) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(n):
        a = int(hashlib.md5(f"a{i}".encode()).hexdigest()[:15], 16) % (MINHASH_M - 1) + 1
        b = int(hashlib.md5(f"b{i}".encode()).hexdigest()[:15], 16) % MINHASH_M
        out.append((a, b))
    return out


MINHASH_PERMS = _perm_constants()


def minhash_value(base_hash: Column, perm: int) -> Column:
    """The ``perm``-th universal hash of a pre-computed base hash column
    (``md5_long(shingle) % MINHASH_M``). All operands < 2³¹, so the
    multiply stays in signed-64 range — bit-identical in DuckDB BIGINT."""
    a, b = MINHASH_PERMS[perm]
    return (F.lit(a) * base_hash + F.lit(b)) % F.lit(MINHASH_M)


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (empty when the
    document has fewer than n tokens).

    CALLER CONTRACT: pass a pre-projected COLUMN REFERENCE (project
    ``tokens(...)`` with its own alias in a prior select), never the
    ``tokens(...)`` expression inline. The lambda below references the
    array ~n+2 times via element_at; handing it a non-trivial
    expression lets the planner evaluate that expression once PER
    REFERENCE (an inline ``tokens()`` regexp re-ran per element —
    measured 20 s vs 0.8 s on the sf0.1 corpus). A bare column
    reference is free to repeat; every call site in this repo follows
    the two-select shape."""
    joined = F.transform(
        F.sequence(F.lit(0), F.size(tokens_col) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens_col, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(tokens_col) >= n, F.array_distinct(joined)).otherwise(
        F.array().cast("array<string>")
    )


def rolling_fingerprint(tokens_col: Column) -> Column:
    """Order-sensitive polynomial rolling hash over token hashes:
    h ← (h·31 + md5_32(token)) mod (2³¹−1). A reordered document gets a
    different fingerprint, unlike bag-of-shingles methods."""
    return F.aggregate(
        F.transform(tokens_col, lambda t: md5_long(t, 8)),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % FINGERPRINT_MOD,
    )
