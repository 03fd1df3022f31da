"""Partition-pruned layouts and the custom stateful streaming operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreducelearnings_spark.catalog import load_table
from mapreducelearnings_spark.sources import io as IO
from mapreducelearnings_spark.streaming import windows as SW


def test_partitioned_write_prunes_directories(spark, sf_dir, tmp_path):
    """A filter on the partition column must show up as a PartitionFilter
    (directory pruning), not a data filter."""
    li = load_table(spark, sf_dir, "lineitem")
    path = str(tmp_path / "li_part")
    IO.write_partitioned(li, path, ["l_returnflag"])
    back = IO.read_parquet(spark, path).where(F.col("l_returnflag") == "R")
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan
    assert back.count() == li.where(F.col("l_returnflag") == "R").count()


def test_streaming_dedup_drops_replayed_rows(spark, sf_dir, tmp_path):
    """Feed the events source DOUBLED (every row replayed once — the
    at-least-once-delivery failure mode streaming dedup exists for);
    dropDuplicatesWithinWatermark must emit each event_id exactly once
    and reproduce the batch-distinct row count."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    pq.write_table(pa.concat_tables([t, t]), str(tmp_path / "events.parquet"))
    SW.run_dedup_stream_to_memory(spark, str(tmp_path), table_name="t_dedup")
    out = spark.sql("SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS d FROM t_dedup").first()
    assert out["n"] == out["d"] == t.num_rows


def test_stateful_stream_totals_match_batch(spark, sf_dir):
    """Drain the bounded events source through applyInPandasWithState;
    the final running total per user must equal the batch aggregation
    (the reference-free §2.10 stateful surface, equivalence-tested the
    same way the windowed agg is)."""
    SW.run_stateful_stream_to_memory(spark, sf_dir, table_name="t_totals")
    # update-mode sink emits one row per (microbatch, user); the final
    # state per user is the row with the highest n_events
    stream = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.sql(
            """
            SELECT user_id, n_events, sum_value FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) AS rn
              FROM t_totals) WHERE rn = 1
            """
        ).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert stream == batch


def test_checkpoint_recovery_processes_only_new_files(spark, sf_dir, tmp_path):
    """Exactly-once source recovery: drain a file-source dir through a
    CHECKPOINTED file sink, add a second source file, drain again from
    the SAME checkpoint — the output gains only the new file's rows
    (the first file is never reprocessed). This is the restart story a
    100 TB/day ingest pipeline depends on: the checkpoint holds the
    processed-file log + sink commit log, so a crash/restart cannot
    double-ingest."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "e1.parquet")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def drain():
        stream = (
            spark.readStream.schema(SW.EVENTS_RAW_SCHEMA)
            .format("parquet")
            .load(str(src))
        )
        q = (
            stream.select("event_id", "event_type")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    base = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert spark.read.parquet(out).count() == base
    shutil.copy(f"{sf_dir}/events.parquet", src / "e2.parquet")
    drain()
    # e1 NOT reprocessed (would be 3x), e2 processed exactly once
    assert spark.read.parquet(out).count() == 2 * base


def test_foreachbatch_upsert_totals_and_replay_safety(spark, sf_dir, tmp_path):
    """foreachBatch keyed upsert: after draining, the keyed table holds
    exactly the batch per-user totals; a second drain over an unchanged
    source (fresh checkpoint, same batch content replayed as batch 0)
    must be a no-op thanks to the _batch_ids idempotence guard."""
    import shutil

    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", src / "events.parquet")
    out = str(tmp_path / "totals")
    SW.run_user_totals_upsert_stream(
        spark, str(src), out, str(tmp_path / "ck1")
    )
    got = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    want = {
        r["user_id"]: (r["n"], r["v"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .collect()
    }
    assert got == want
    # replay: new checkpoint sees the same file as batch 0 again; the
    # _batch_ids guard must skip the merge, leaving totals unchanged
    SW.run_user_totals_upsert_stream(
        spark, str(src), out, str(tmp_path / "ck2")
    )
    got2 = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }
    assert got2 == want
