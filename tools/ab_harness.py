"""Order-balanced A/B timing harness for optimization toggles.

A naive alternating A/B (A then B, repeated) is systematically biased:
the second run of the same query benefits from shared JIT-compiled
generated classes and the OS page cache even with Spark caches cleared
— measured ~1.2–1.3× in favor of WHICHEVER variant runs second (r14).
This harness runs an ABBA schedule per query (A,B,B,A per block) so
both variants occupy both positions equally, and reports min + median.

Usage (as a library from a driver script):
    from tools.ab_harness import ab
    ab(spark, REGISTRY, ["query", ...], sf_dir, set_a=..., set_b=..., blocks=2)
"""

from __future__ import annotations

import gc
import time


def _cold(spark) -> None:
    gc.collect()
    spark.catalog.clearCache()
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)


def time_query(spark, registry, name: str, sf_dir: str) -> float:
    _cold(spark)
    t0 = time.perf_counter()
    registry[name].spark(spark, sf_dir).count()
    return time.perf_counter() - t0


def ab(spark, registry, names, sf_dir, set_a, set_b, blocks: int = 2):
    """Run an ABBA schedule per query; returns {name: (min_a, min_b)}."""
    res = {n: {"a": [], "b": []} for n in names}
    for _ in range(blocks):
        for n in names:
            for variant in ("a", "b", "b", "a"):
                (set_a if variant == "a" else set_b)()
                res[n][variant].append(time_query(spark, registry, n, sf_dir))
    out = {}
    for n in names:
        a, b = min(res[n]["a"]), min(res[n]["b"])
        out[n] = (a, b)
        print(
            f"{n:30s} A={a:6.2f} B={b:6.2f}  B/A={b / a:.2f} "
            f"(all A={['%.2f' % x for x in res[n]['a']]} "
            f"B={['%.2f' % x for x in res[n]['b']]})"
        )
    return out
