"""Structured Streaming correctness across MULTIPLE micro-batches.

The registered streaming queries ingest one file => one batch; these
tests split the events into several files and throttle the file source
(maxFilesPerTrigger=1) so availableNow processes them as separate
micro-batches — proving windowed/session state genuinely accumulates
across batches and the final result still equals the batch computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hdfs_with_pyspark_spark import schemas
from hdfs_with_pyspark_spark.sources.io import read_table
from hdfs_with_pyspark_spark.streaming.ops import (
    run_to_table,
    session_stats,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_events_dir(spark, tmp_path_factory):
    """Events split into 4 time-range files, written oldest first — the
    realistic arrival order for a growing event log. (A hash split would
    feed each later batch data older than the advancing watermark, which
    session windows rightly DROP — correct late-data semantics, but not
    the scenario under test.)"""
    import time

    from pyspark.sql import Window
    out = str(tmp_path_factory.mktemp("stream") / "events")
    ev = read_table(spark, SF_DIR, "events").cache()
    ev_sorted = ev.withColumn(
        "__rank", F.row_number().over(Window.orderBy("ts", "event_id")))
    n = ev.count()
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        (ev_sorted.where((F.col("__rank") > lo) & (F.col("__rank") <= hi))
                  .drop("__rank")
                  .coalesce(1)
                  .write.mode("append").parquet(out))
        time.sleep(1.1)  # distinct mtimes => deterministic batch order
    ev.unpersist()
    return out


def _throttled_stream(spark, path):
    # The split files are Spark-written TIMESTAMP(MICROS) — the logical
    # schema applies directly (no nanos conversion, unlike the raw
    # driver-generated table).
    return (spark.readStream
                 .schema(schemas.EVENTS)
                 .option("maxFilesPerTrigger", 1)
                 .parquet(path))


def test_windowed_counts_across_batches(spark, split_events_dir):
    batch = spark.read.parquet(split_events_dir)
    want = sorted(map(tuple, (
        batch.groupBy(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                      .alias("day"), "event_type")
             .agg(F.count("*").alias("n_events"),
                  F.round(F.sum("value"), 2).alias("sum_value"))
    ).collect()))
    got = sorted(map(tuple, run_to_table(
        windowed_event_counts(_throttled_stream(spark, split_events_dir)),
        "complete").collect()))
    assert got == want


def test_session_stats_across_batches(spark, split_events_dir):
    # Session windows are the hard case: a batch boundary inside a session
    # must not split it. Compare against batch session_window semantics.
    batch = spark.read.parquet(split_events_dir)
    want = sorted(map(tuple, (
        batch.groupBy(F.session_window("ts", "8 hours").alias("s"), "user_id")
             .agg(F.count("*").alias("n_events"))
             .select("user_id",
                     F.date_format("s.start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
                      .alias("session_start"),
                     "n_events")
    ).collect()))
    got = sorted(map(tuple, run_to_table(
        session_stats(_throttled_stream(spark, split_events_dir)),
        "complete").collect()))
    assert got == want


def test_stream_upsert_sink_matches_batch_recompute(spark, tmp_path):
    # The foreachBatch-merge dim must end up exactly equal to the batch
    # groupBy over the same events — the streaming SCD1 path is
    # semantically a continuous version of the batch aggregate.
    from pyspark.sql import functions as F

    from hdfs_with_pyspark_spark.sources.io import read_table
    from hdfs_with_pyspark_spark.streaming.ops import stream_upsert_sink

    sf = "/root/testdata/sf0.001"
    dim = str(tmp_path / "user_dim")
    stream_upsert_sink(spark, sf, dim)

    got = {r["user_id"]: (r["n_events"], r["sum_value"])
           for r in spark.read.parquet(dim).collect()}
    want = {r["user_id"]: (r["n"], r["s"])
            for r in (read_table(spark, sf, "events")
                      .groupBy("user_id")
                      .agg(F.count("*").alias("n"),
                           F.round(F.sum("value"), 2).alias("s"))
                      .collect())}
    assert got == want


def test_stream_upsert_sink_recovers_retired_dim(spark, tmp_path):
    # Crash window simulation: the dim was retired to __old but the new
    # copy never swapped in. The next run must roll the __old copy
    # forward, not start from an empty dimension.
    import os

    from pyspark.sql import functions as F

    from hdfs_with_pyspark_spark.sources.io import read_table
    from hdfs_with_pyspark_spark.streaming.ops import stream_upsert_sink

    sf = "/root/testdata/sf0.001"
    dim = str(tmp_path / "user_dim")
    stream_upsert_sink(spark, sf, dim)
    os.rename(dim, dim + "__old")           # simulate the crash window
    stream_upsert_sink(spark, sf, dim)
    got = {r["user_id"]: (r["n_events"], r["sum_value"])
           for r in spark.read.parquet(dim).collect()}
    want = {r["user_id"]: (r["n"], r["s"])
            for r in (read_table(spark, sf, "events")
                      .groupBy("user_id")
                      .agg(F.count("*").alias("n"),
                           F.round(F.sum("value"), 2).alias("s"))
                      .collect())}
    assert got == want
    assert not os.path.exists(dim + "__old")


def test_read_parquet_if_absent_distinguishes_corruption(spark, tmp_path):
    """VERDICT r4 item 5: the band-store existence probe must read ONLY
    path-not-found as 'store absent' (first-batch behavior); a corrupted
    store must raise loudly instead of silently resetting dedup state."""
    import pytest

    from hdfs_with_pyspark_spark.streaming.ops import _read_parquet_if_absent

    # absent path -> None (first batch)
    assert _read_parquet_if_absent(spark, str(tmp_path / "nope")) is None

    # corrupted store (garbage bytes, no parquet footer) -> loud failure
    corrupt = tmp_path / "store"
    corrupt.mkdir()
    (corrupt / "part-00000.parquet").write_bytes(b"not a parquet file")
    def probe_and_read():
        df = _read_parquet_if_absent(spark, str(corrupt))
        if df is not None:  # schema may lazily analyze; force a read
            df.collect()

    with pytest.raises(Exception):
        probe_and_read()


def test_watermark_drop_rule_pinned(spark, tmp_path):
    """Pin the engine's late-drop semantics the late-data audit's oracle
    encodes: (1) the drop predicate is WINDOW-END based, non-strict
    (window.end <= watermark drops; a row whose raw ts is behind the
    watermark but whose window is still open is aggregated), and
    (2) a freshly-advanced watermark filters from the second following
    micro-batch (so the audit stages late rows two batches after the
    max-ts batch). If a Spark upgrade changes either, this fails before
    the oracle silently diverges."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    batches = [
        [("2020-01-05 00:00:00", "max")],       # wm -> 2020-01-04 00:00
        [("2020-01-04 12:00:00", "mid")],       # heartbeat
        [("2020-01-03 22:00:00", "end_eq_wm"),  # window end == wm -> drop
         ("2020-01-02 12:00:00", "end_lt_wm"),  # window end < wm  -> drop
         ("2020-01-04 09:00:00", "fresh")],     # open window      -> keep
    ]
    base_t = 1_700_000_000
    for k, rows in enumerate(batches):
        df = (spark.createDataFrame(rows, "ts string, tag string")
                   .select(F.col("ts").cast("timestamp").alias("ts"), "tag"))
        stage = str(tmp_path / f"stage{k}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(in_dir, f"batch_{k}.parquet")
        shutil.move(part, dst)
        os.utime(dst, (base_t + 60 * k, base_t + 60 * k))
        shutil.rmtree(stage)
    out = str(tmp_path / "out")

    def ingest(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"batch={bid}"))

    (spark.readStream.schema("ts timestamp, tag string")
          .option("maxFilesPerTrigger", 1).parquet(in_dir)
          .withWatermark("ts", "1 day")
          .groupBy(F.window("ts", "1 day").alias("w"))
          .agg(F.collect_list("tag").alias("tags"))
          .writeStream
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .foreachBatch(ingest).outputMode("update")
          .trigger(availableNow=True).start().awaitTermination())
    tags = set()
    for r in spark.read.parquet(out).collect():
        tags.update(r["tags"])
    assert "fresh" in tags and "max" in tags and "mid" in tags
    assert "end_eq_wm" not in tags       # window.end == wm -> dropped
    assert "end_lt_wm" not in tags       # window.end <  wm -> dropped


def test_late_data_audit_ties_out(spark, sf_dir):
    """Counts reconcile per key (n_stream + dropped == n_batch), drops
    actually occur on this corpus (the whole tail except the last day's
    open windows is beyond the 1-day watermark), and only open windows
    retain events."""
    from hdfs_with_pyspark_spark.streaming.ops import stream_late_data_audit

    rows = stream_late_data_audit(spark, sf_dir).collect()
    assert rows
    assert all(r["n_stream"] + r["n_late_dropped"] == r["n_batch"]
               for r in rows)
    assert sum(r["n_late_dropped"] for r in rows) > 0
    kept_days = sorted({r["day"] for r in rows if r["n_stream"] > 0})
    dropped_days = sorted({r["day"] for r in rows if r["n_late_dropped"] > 0})
    # every retained day is at or after every fully-dropped day's window
    if kept_days and dropped_days:
        assert min(kept_days) >= max(d for d in dropped_days
                                     if d not in kept_days)


def test_stream_ivm_matches_batch_and_replays_idempotently(spark, sf_dir):
    """The streaming-maintained view equals the batch recompute, and a
    REPLAYED final micro-batch (same batch_id, same rows) rewrites the
    same snapshot instead of double-counting — the foreachBatch
    at-least-once contract."""
    import hashlib
    import os

    from hdfs_with_pyspark_spark.session import scratch_dir
    from hdfs_with_pyspark_spark.sources.io import read_table
    from hdfs_with_pyspark_spark.streaming import ops as so
    from pyspark.sql import functions as F

    out = {r.nation: (r.revenue_cents, r.n_orders)
           for r in so.stream_ivm_revenue(spark, sf_dir).collect()}
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey")
    nation = read_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name")
    truth = {r.nation: (r.revenue_cents, r.n_orders)
             for r in (orders
                       .join(customer,
                             F.col("o_custkey") == F.col("c_custkey"))
                       .join(nation,
                             F.col("c_nationkey") == F.col("n_nationkey"))
                       .groupBy(F.col("n_name").alias("nation"))
                       .agg(F.sum(F.expr(
                           "CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
                             .cast("long").alias("revenue_cents"),
                            F.count("*").cast("long").alias("n_orders"))
                       .collect())}
    assert out == truth

    # Replay: re-apply the LAST batch's ingest with the same batch_id.
    # Snapshot K-1 must be byte-equal (derived from snapshot K-2 +
    # batch rows, overwritten in place).
    k = so.STREAM_IVM_BATCHES - 1
    sf_key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    root = scratch_dir(spark, f"stream_ivm_revenue_{sf_key}")
    snap_path = os.path.join(root, f"snapshot_{k}")
    before = {r.nation: (r.revenue_cents, r.n_orders)
              for r in spark.read.parquet(snap_path).collect()}
    # Rebuild the ingest closure state by invoking the module-level
    # merge logic through a fresh foreachBatch-equivalent call: the
    # ingest function is defined inside stream_ivm_revenue, so replay
    # by reproducing its exact merge here from the public pieces.
    batch = orders.where(F.col("o_orderkey") % so.STREAM_IVM_BATCHES == k)
    prev = spark.read.parquet(os.path.join(root, f"snapshot_{k - 1}"))
    delta = (batch
             .join(F.broadcast(customer),
                   F.col("o_custkey") == F.col("c_custkey"))
             .join(F.broadcast(nation),
                   F.col("c_nationkey") == F.col("n_nationkey"))
             .groupBy(F.col("n_name").alias("nation"))
             .agg(F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
                   .alias("d_rev"),
                  F.count("*").alias("d_n")))
    merged = (prev.select("nation",
                          F.col("revenue_cents").alias("b_rev"),
                          F.col("n_orders").alias("b_n"))
                  .join(delta, "nation", "full_outer")
                  .select("nation",
                          (F.coalesce("b_rev", F.lit(0))
                           + F.coalesce("d_rev", F.lit(0))).cast("long")
                          .alias("revenue_cents"),
                          (F.coalesce("b_n", F.lit(0))
                           + F.coalesce("d_n", F.lit(0))).cast("long")
                          .alias("n_orders")))
    replay = {r.nation: (r.revenue_cents, r.n_orders)
              for r in merged.collect()}
    assert replay == before


def test_stage_arrival_files_single_write(spark, tmp_path):
    """r11 staging helper: one partitioned write yields exactly one file
    per batch in mtime order, an empty batch still gets a (0-row) file,
    and the staged rows round-trip exactly."""
    import glob
    import os

    from hdfs_with_pyspark_spark.streaming.ops import _stage_arrival_files

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 7 % 97).alias("payload"))
    in_dir = str(tmp_path / "in")
    # batch 1 deliberately empty (the heartbeat shape): 0 -> 0, 2 -> rest
    batch = F.when(F.col("doc_id") < 50, 0).otherwise(2)
    _stage_arrival_files(df, batch, 3, in_dir)

    files = sorted(glob.glob(os.path.join(in_dir, "batch_*.parquet")))
    assert [os.path.basename(f) for f in files] == [
        "batch_0.parquet", "batch_1.parquet", "batch_2.parquet"]
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3
    # no leftover stage dir, no extra part files
    assert not os.path.exists(in_dir + "__stage")
    b0 = spark.read.parquet(files[0])
    b1 = spark.read.parquet(files[1])
    b2 = spark.read.parquet(files[2])
    assert b0.columns == ["doc_id", "payload"]  # __b never reaches the file
    assert b1.count() == 0 and b1.columns == ["doc_id", "payload"]
    got = sorted((r.doc_id, r.payload) for r in b0.unionByName(b2).collect())
    want = sorted((r.doc_id, r.payload) for r in df.collect())
    assert got == want
