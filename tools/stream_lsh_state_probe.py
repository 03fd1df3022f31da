"""State-store occupancy curve of the streaming LSH drain under
ADVANCING event time (VERDICT r11 Next #4).

The r11 100× measurement showed the drain's wall time growing 2.64×
per decade with state ∝ distinct bands — which is the correct cost
model for the PARITY fixture, whose derived event time parks the whole
corpus inside one join window (nothing is ever watermark-evicted). A
production ingest stream instead has event time advancing under it, so
the join's time-range predicates + dropDuplicatesWithinWatermark evict
state older than (join window + watermark delay) and keyed state is
bounded by the HORIZON, not the corpus. This probe drives that model
at an arbitrary scaled dir: the docs are split into N source files,
drained file-by-file (maxFilesPerTrigger=1) with one-doc-per-second
arrivals, and the per-microbatch ``stateOperators[*].numRowsTotal``
curve is printed as one JSON line — peak vs corpus is the bound the
eviction pytest asserts at fixture scale
(tests/test_streaming_stateful.py::test_streaming_lsh_state_evicts_with_watermark).

Usage: python tools/stream_lsh_state_probe.py [docs_dir] [n_files]
Default: /tmp/scale_smoke/sf0.100 (the 100× dir), 10 files.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_smoke/sf0.100"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    import pyarrow.parquet as pq

    from mapreducelearnings_spark.pipeline import dedup as DD
    from mapreducelearnings_spark.session import get_spark
    from mapreducelearnings_spark.streaming import windows as SW

    t = pq.read_table(f"{src_dir}/documents.parquet").sort_by("doc_id")
    n = t.num_rows
    split_dir = tempfile.mkdtemp(prefix="slsh_state_probe_")
    for i in range(n_files):
        lo, hi = i * n // n_files, (i + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), f"{split_dir}/d{i:03d}.parquet")

    spark = get_spark("stream-lsh-state-probe", shuffle_partitions=32)
    t0 = time.perf_counter()
    progress = SW.run_streaming_lsh_to_memory(
        spark,
        split_dir,
        table_name="slsh_state_probe",
        glob="*.parquet",
        watermark="10 minutes",
        max_files_per_trigger=1,
        arrival_period_s=1,  # one doc per second: horizon ~4200 docs
        arrival_spread_s=1_000_000_000,  # never wraps: time advances
    )
    dt = time.perf_counter() - t0
    curve = [
        sum(op["numRowsTotal"] for op in p["stateOperators"])
        for p in progress
        if p.get("stateOperators")
    ]
    pairs = spark.table("slsh_state_probe").count()
    spark.stop()
    total_banded = n * DD.BANDS
    print(
        json.dumps(
            {
                "docs_dir": src_dir,
                "n_docs": n,
                "n_files": n_files,
                "drain_sec": round(dt, 1),
                "pairs": pairs,
                "state_curve": curve,
                "state_peak": max(curve) if curve else 0,
                "one_side_unbounded_rows": total_banded,
                "peak_over_unbounded": round(
                    max(curve) / total_banded, 4
                )
                if curve
                else 0.0,
            }
        )
    )


if __name__ == "__main__":
    main()
