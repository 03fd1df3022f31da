"""Custom connector surface: the reference's synthetic chain-graph
generator (PageRankRDD/.../FollowerCount.scala:33-50) re-expressed as a
PLUGGABLE SOURCE via the Spark 4 Python Data Source API — the engine's
demonstration that a new input system (an internal service, a feed, a
bespoke format) plugs in as `spark.read.format(...)` without touching
the JVM.

Scale shape: generation is pushed into N range partitions that
materialize INSIDE the scan (one Arrow RecordBatch per partition — no
driver data transfer, no Python-row boxing), and predicate pushdown on
``src`` narrows the generated range BEFORE partition planning, so a
filtered read plans fewer partitions instead of generating-then-
filtering. That's the same contract the parquet reader honors
(PushedFilters + partition pruning), proven here for a Python source.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)


class SrcRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start  # inclusive
        self.end = end  # exclusive


class ChainEdgesReader(DataSourceReader):
    """Edges src→dst for k chains of k vertices (ids 1..k²); chain
    tails (src % k == 0) point at the dangling dummy vertex 0."""

    def __init__(self, options):
        self.k = int(options.get("k", "100"))
        self.n_parts = int(options.get("partitions", "8"))
        self.lo = 1  # narrowed by pushFilters
        self.hi = self.k * self.k  # inclusive

    def pushFilters(self, filters: list[Filter]):
        """Consume range predicates on ``src`` (the generation axis) by
        narrowing [lo, hi]; everything else is left for Spark. Pushed
        filters are exact here, so none of the consumed ones need
        re-evaluation post-scan."""
        for f in filters:
            col = getattr(f, "attribute", None)
            if col == ("src",):
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, int(f.value))
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, int(f.value) - 1)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, int(f.value))
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, int(f.value) + 1)
                    continue
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, int(f.value))
                    continue
            yield f

    def partitions(self):
        """Contiguous src ranges over the (possibly filter-narrowed)
        span — fewer partitions for a narrowed read, never
        generate-then-filter."""
        span = self.hi - self.lo + 1
        if span <= 0:
            return [SrcRange(self.lo, self.lo)]  # empty scan
        width = -(-span // self.n_parts)  # ceil
        return [
            SrcRange(s, min(s + width, self.hi + 1))
            for s in range(self.lo, self.hi + 1, width)
        ]

    def read(self, partition: SrcRange):
        """One Arrow RecordBatch per partition: columnar hand-off to the
        JVM, no per-row Python boxing."""
        import numpy as np
        import pyarrow as pa

        src = np.arange(partition.start, partition.end, dtype=np.int64)
        dst = np.where(src % self.k == 0, np.int64(0), src + 1)
        yield pa.RecordBatch.from_arrays(
            [pa.array(src), pa.array(dst)], names=["src", "dst"]
        )


class ChainEdgesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "chain_edges"

    def schema(self) -> str:
        return "src BIGINT, dst BIGINT"

    def reader(self, schema) -> ChainEdgesReader:
        return ChainEdgesReader(self.options)

    def streamReader(self, schema) -> "ChainEdgesStreamReader":
        return ChainEdgesStreamReader(self.options)


def register_chain_edges(spark) -> None:
    """Idempotent registration of the connector on a session. Python
    data-source filter pushdown is gated off by default; the reader
    implements pushFilters, so enable it (runtime-settable)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ChainEdgesDataSource)


class ChainEdgesStreamReader(DataSourceStreamReader):
    """Micro-batch STREAM variant of the connector: the offset is the
    next src id to emit ({"pos": n}), each batch advances it by
    ``rows_per_batch`` until the k² cap, and every batch's range is
    split into ``partitions`` executor-side Arrow reads — the full
    partition-planned DataSourceStreamReader, not the driver-side
    Simple reader (generation must scale with the cluster, not the
    driver). Offsets are exactly replayable: partitions(start, end) is
    a pure function of the offsets, so checkpoint recovery re-plans the
    identical batch."""

    def __init__(self, options):
        self.k = int(options.get("k", "100"))
        self.n_parts = int(options.get("partitions", "4"))
        self.rows_per_batch = int(options.get("rows_per_batch", "50"))
        self.cap = self.k * self.k + 1  # exclusive end of src ids

    def initialOffset(self) -> dict:
        return {"pos": 1}

    def latestOffset(self) -> dict:
        # driver-side bookkeeping only: advance the high-water mark one
        # batch quantum, clamped to the finite corpus cap
        cur = getattr(self, "_pos", 1)
        nxt = min(cur + self.rows_per_batch, self.cap)
        self._pos = nxt
        return {"pos": nxt}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        if hi <= lo:
            return []
        width = -(-(hi - lo) // self.n_parts)
        return [SrcRange(s, min(s + width, hi)) for s in range(lo, hi, width)]

    def read(self, partition: SrcRange):
        import numpy as np
        import pyarrow as pa

        src = np.arange(partition.start, partition.end, dtype=np.int64)
        dst = np.where(src % self.k == 0, np.int64(0), src + 1)
        yield pa.RecordBatch.from_arrays(
            [pa.array(src), pa.array(dst)], names=["src", "dst"]
        )

    def commit(self, end: dict) -> None:
        pass  # nothing external to clean up; offsets live in the checkpoint


# ---------------------------------------------------------------------------
# Custom SINK: the write side of the Python Data Source API — a JSONL
# sink with the full task-commit protocol (speculative/failed task
# attempts write to invisible temp files; only the driver-side commit
# publishes them, and abort removes every orphan). This is the same
# two-phase contract every production Spark sink honors; proven here
# for a pure-Python connector. Local-FS paths here; on a cluster the
# target must be shared storage, like any file sink.
# ---------------------------------------------------------------------------

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _JsonlCommit(WriterCommitMessage):
    tmp_file: str
    rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("pyjsonl sink requires option('path', ...)")
        self.fail_marker = options.get("fail_on_value")  # test hook: abort path
        self.overwrite = overwrite

    def write(self, iterator):
        """Runs on EXECUTORS, once per partition (and once per retried
        attempt): writes to a uuid temp file that no reader can mistake
        for data — publication happens only in commit()."""
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp_{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                d = row.asDict()
                if self.fail_marker is not None and str(
                    d.get("src")
                ) == str(self.fail_marker):
                    raise RuntimeError("injected task failure (test hook)")
                f.write(json.dumps(d, sort_keys=True) + "\n")
                n += 1
        return _JsonlCommit(tmp_file=tmp, rows=n)

    def commit(self, messages):
        """Driver-side publish: exactly the attempts Spark reports as
        successful are renamed to visible part files; stray temp files
        from failed/speculative attempts are swept. Every save
        publishes under a fresh uuid run suffix (successive appends
        never collide on the part index). mode('overwrite') is
        crash-linearizable for manifest-aware readers via a 3-step
        order, each step atomic:

        1. rename the NEW part files in;
        2. atomically swap ``_committed.json`` to name the new run
           suffix (the commit point);
        3. sweep stale parts from prior runs (different suffix).

        A crash before step 2 leaves the OLD manifest → a manifest
        reader still sees exactly the old run; a crash before step 3
        leaves the new manifest → a manifest reader sees exactly the
        new run; either way :func:`committed_parts` returns ONE
        consistent dataset and the next overwrite's sweep completes
        cleanup. A suffix-blind ``glob('part-*')`` reader sees a
        superset only inside the step-2→3 crash window — the
        documented trade against the old delete-first order, which
        could lose BOTH copies. Ordering + manifest contracts are
        tested."""
        import glob
        import json
        import os
        import uuid

        run = uuid.uuid4().hex[:8]
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{i:05d}-{run}.jsonl")
            os.replace(m.tmp_file, final)
        manifest = os.path.join(self.path, "_committed.json")
        if self.overwrite:
            tmp_manifest = manifest + f".{run}.tmp"
            with open(tmp_manifest, "w") as f:
                f.write(json.dumps({"run": run, "parts": len(messages)}))
            os.replace(tmp_manifest, manifest)  # the commit point
            for stale in glob.glob(os.path.join(self.path, "part-*.jsonl")):
                if not stale.endswith(f"-{run}.jsonl"):
                    os.remove(stale)
        elif os.path.exists(manifest):
            # Append onto a previously-overwritten directory: a stale
            # single-run manifest would hide every appended part from
            # committed_parts(), so the append's commit point (for
            # manifest-aware readers) is the atomic removal of the
            # manifest — the directory degrades to append-mode and the
            # reader falls back to all visible parts. A crash before
            # the remove leaves a consistent-but-stale view (exactly
            # the pre-append dataset), never a torn one.
            os.remove(manifest)
        for orphan in glob.glob(os.path.join(self.path, "_tmp_*.jsonl")):
            os.remove(orphan)

    def abort(self, messages):
        import glob
        import os

        for orphan in glob.glob(os.path.join(self.path, "_tmp_*.jsonl")):
            os.remove(orphan)


class JsonlSinkDataSource(DataSource):
    """`df.write.format("pyjsonl").option("path", p).save()`."""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options, overwrite)


def committed_parts(path: str) -> list[str]:
    """The one consistent view of an overwrite-mode pyjsonl directory:
    the part files of the run named by ``_committed.json`` (crash
    between publish and sweep leaves extra files on disk, but never a
    manifest pointing at a half-present run — see
    :meth:`JsonlSinkWriter.commit`). Falls back to all part files when
    no manifest exists: append-only directories never write one, and
    an append onto an overwritten directory atomically removes the
    stale manifest at its commit (so appended parts are never silently
    hidden here)."""
    import glob
    import json
    import os

    manifest = os.path.join(path, "_committed.json")
    parts = sorted(glob.glob(os.path.join(path, "part-*.jsonl")))
    if not os.path.exists(manifest):
        return parts
    with open(manifest) as f:
        run = json.load(f)["run"]
    return [p for p in parts if p.endswith(f"-{run}.jsonl")]


def register_jsonl_sink(spark) -> None:
    spark.dataSource.register(JsonlSinkDataSource)
