"""Rate-controlled streaming read of the clip table + pipeline assembly.

Replaces the reference's Kafka source chain (``KafkaSource`` + Avro decode,
``TransactionFraudExample.java:52-57``; paced producer
``TransactionEventSimulator.java:27,55`` at 1 batch / 5 ms) with Structured
Streaming over the materialized clip table:

- **File-paced replay**: the table is written as many small parquet files;
  ``readStream.parquet(dir)`` + ``maxFilesPerTrigger`` replays them in
  deterministic file order, N files per micro-batch. Checkpointing tracks the
  file offsets, so kill/restart resumes exactly (T3).
- **Row-paced replay** (``rate-micro-batch`` joined to an indexed snapshot) is
  available for fixed rows/sec pacing, at the cost of a join per batch.

The assembled pipeline mirrors ``TransactionFraudExample.run`` (:33-77):
source → event-time watermark (60 s) → keyed tumbling/sliding/session window
aggregate → exactly-once ledger sink.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.sink import ParquetLedgerSink
from engine.windows import session_agg, sliding_agg, tumbling_agg

CLIP_SCHEMA_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, "
    "transcript string, event_ts timestamp, speaker_id long"
)


_CLIP_PA_SCHEMA_FIELDS = (
    ("clip_id", "string"),
    ("bytes", "binary"),
    ("sr_hz", "int32"),
    ("dur_ms", "int32"),
    ("codec", "string"),
    ("transcript", "string"),
    ("event_ts", "timestamp[us]"),
    ("speaker_id", "int64"),
)


def _write_clip_file(args) -> str:
    """One producer shard: generate [start, start+n) deterministically and
    write a single parquet file. Top-level so multiprocessing can pickle it."""
    dir_path, i, start, n, seed, kw = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.synth import make_clips_pdf

    pdf = make_clips_pdf(n, seed=seed, start_index=start, **kw)
    schema = pa.schema([(name, pa.type_for_alias(t)) for name, t in _CLIP_PA_SCHEMA_FIELDS])
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    out = os.path.join(dir_path, f"part-{i:05d}.parquet")
    pq.write_table(table, out)
    return out


def write_clips_stream_dir(
    dir_path: str, n_clips: int, n_files: int = 20, seed: int = 42,
    parallelism: int | None = None, **kw
) -> str:
    """Materialize the clip table as ``n_files`` parquet chunks in arrival
    order — the replayable 'topic'. (Producer job, ``SimProducer.java:24-47``.)

    Shards are generated in parallel processes; each shard's rng derives from
    ``(seed, start_index)`` (engine.synth.make_clips_pdf), so output is
    deterministic regardless of parallelism."""
    os.makedirs(dir_path, exist_ok=True)
    for stale in os.listdir(dir_path):  # rewriting the topic: drop old shards
        if stale.startswith("part-") and stale.endswith(".parquet"):
            os.remove(os.path.join(dir_path, stale))
    chunk = (n_clips + n_files - 1) // n_files
    tasks = []
    for i in range(n_files):
        start = i * chunk
        n = min(chunk, n_clips - start)
        if n <= 0:
            break
        tasks.append((dir_path, i, start, n, seed, kw))
    if parallelism is None:
        parallelism = min(len(tasks), max(1, (os.cpu_count() or 4) // 2))
    if parallelism <= 1 or len(tasks) <= 1:
        paths = [_write_clip_file(t) for t in tasks]
    else:
        import multiprocessing as mp

        with mp.Pool(parallelism) as pool:
            paths = pool.map(_write_clip_file, tasks)
    # Spark's file stream source replays in modification-time order; parallel
    # shard writes finish out of order, so stamp monotone mtimes to preserve
    # arrival order (the 'topic offset' order).
    base = int(time.time()) - len(paths) - 10
    for i, p in enumerate(sorted(paths)):
        os.utime(p, (base + i, base + i))
    return dir_path


def write_clips_iceberg(
    location: str, n_clips: int, n_files: int = 20, seed: int = 42,
    files_per_snapshot: int | None = None, parallelism: int | None = None,
    **kw,
):
    """The clip + transcript table AS an Iceberg v2 table (north rule:
    "reads an Iceberg table of audio clip + transcript pairs").

    The deterministic producer shards land in the table's ``data/`` dir
    (same bytes as :func:`write_clips_stream_dir`); metadata commits group
    them ``files_per_snapshot`` at a time into append snapshots. Batch
    readers plan via manifests (``IcebergTable.read``); the rate-controlled
    stream replays the same committed files in arrival order via
    :func:`read_clip_stream_iceberg`. Returns the ``IcebergTable``."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from engine.iceberg import DataFileInfo, IcebergTable

    spark_schema = T.StructType([
        T.StructField("clip_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sr_hz", T.IntegerType()),
        T.StructField("dur_ms", T.IntegerType()),
        T.StructField("codec", T.StringType()),
        T.StructField("transcript", T.StringType()),
        T.StructField("event_ts", T.TimestampType()),
        T.StructField("speaker_id", T.LongType()),
    ])
    table = IcebergTable(location, schema=spark_schema)
    write_clips_stream_dir(table.data_dir, n_clips, n_files=n_files,
                           seed=seed, parallelism=parallelism, **kw)
    names = sorted(
        n for n in os.listdir(table.data_dir)
        if n.startswith("part-") and n.endswith(".parquet")
    )
    per_snap = files_per_snapshot or len(names) or 1
    for i in range(0, len(names), per_snap):
        infos = []
        for n in names[i:i + per_snap]:
            p = os.path.join(table.data_dir, n)
            infos.append(DataFileInfo(
                file_path=p,
                record_count=pq.read_metadata(p).num_rows,
                file_size_in_bytes=os.path.getsize(p),
            ))
        table.commit_append(infos)
    return table


def iceberg_stream_data_dir(table) -> str:
    """Validate an Iceberg clip table for file-source streaming and return
    its ``data/`` dir. For append-only tables every live data file sits in
    ``data/`` exactly once (files are moved in atomically before their
    snapshot commits), so the file source over ``data/`` replays precisely
    the committed files; the manifest planner cross-checks that invariant
    here."""
    from engine.iceberg import IcebergTable

    if isinstance(table, str):
        table = IcebergTable(table)
    planned = {f.file_path for f in table.plan_files()}
    on_disk = {
        os.path.join(table.data_dir, n)
        for n in os.listdir(table.data_dir) if n.endswith(".parquet")
    }
    if planned != on_disk:
        raise ValueError(
            f"iceberg table {table.location!r} is not append-only-clean: "
            f"{len(on_disk - planned)} uncommitted and "
            f"{len(planned - on_disk)} missing data files — stream requires "
            "planned files == data/ contents"
        )
    return table.data_dir


def read_clip_stream_iceberg(
    spark: SparkSession,
    table,
    max_files_per_trigger: int = 1,
    watermark: str = "60 seconds",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Rate-controlled stream over an Iceberg clip table (see
    :func:`iceberg_stream_data_dir` for why the file source over ``data/``
    is exact). With the Iceberg runtime jar present,
    ``readStream.format("iceberg")`` replaces this source behind the same
    table layout."""
    return read_clip_stream(spark, iceberg_stream_data_dir(table),
                            max_files_per_trigger=max_files_per_trigger,
                            watermark=watermark, ts_col=ts_col)


def read_clip_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int = 1,
    watermark: str = "60 seconds",
    ts_col: str = "event_ts",
) -> DataFrame:
    """S1 analogue: subscribe to the clip 'topic' from the earliest offset with
    a bounded out-of-orderness watermark (W2)."""
    stream = (
        spark.readStream.schema(CLIP_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(dir_path)
    )
    # watermark=None lets callers that insert a mapInPandas stage define the
    # watermark downstream instead (Spark requires it on the aggregation input
    # and forbids redefinition).
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return stream


def read_clip_stream_paced(
    spark: SparkSession,
    dir_path: str,
    rows_per_batch: int = 1000,
    watermark: str | None = "60 seconds",
    ts_col: str = "event_ts",
) -> DataFrame:
    """Row-paced replay (S2 pacing analogue): a ``rate-micro-batch`` ticker
    joined to an arrival-order-indexed snapshot of the clip table, emitting
    exactly ``rows_per_batch`` clips per micro-batch — the fixed rows/sec
    equivalent of the simulator's 5 ms-per-batch pacing
    (``TransactionEventSimulator.java:27,55``).

    The stream is unbounded (the ticker keeps counting past the table end and
    the join just stops matching) — callers stop the query once the sink has
    consumed the table.  Costs a stream-static join per batch, so
    :func:`read_clip_stream` (file-paced) is the default; this variant exists
    for rate experiments.  The arrival index is a global sort by
    ``(event_ts, clip_id)`` — fine at bench scale; at warehouse scale you
    would persist the index once instead.
    """
    from pyspark.sql.window import Window

    snap = (
        spark.read.parquet(dir_path)
        # batch parquet reads surface timestamp_ntz; watermarks need timestamp
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withColumn(
            "__idx",
            F.row_number().over(Window.orderBy(ts_col, "clip_id")) - 1,
        )
    )
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
        .select(F.col("value").alias("__idx"))
    )
    stream = rate.join(snap, on="__idx").drop("__idx")
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return stream


def run_window_pipeline(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window_kind: str = "tumbling",
    width: str = "10 minutes",
    slide: str = "5 minutes",
    gap: str = "30 seconds",
    key_col: str = "speaker_id",
    value_col: str = "dur_ms",
    watermark: str = "60 seconds",
    max_files_per_trigger: int = 1,
    bug_compatible_stdev: bool = False,
    await_termination: bool = True,
    sink=None,
):
    """The flagship streaming job (TransactionFraudExample analogue):
    rate-controlled source → watermark → keyed window agg → exactly-once sink.

    ``sink`` overrides the default ``ParquetLedgerSink`` with any object
    exposing the same ``foreach_batch``/``audit``/``read_committed``
    protocol (e.g. ``engine.iceberg.IcebergSink``).

    Returns (StreamingQuery, sink).
    """
    src = read_clip_stream(
        spark, clips_dir, max_files_per_trigger=max_files_per_trigger, watermark=watermark
    )
    if window_kind == "tumbling":
        agg = tumbling_agg(src, "event_ts", key_col, value_col, width,
                           bug_compatible_stdev=bug_compatible_stdev)
    elif window_kind == "sliding":
        agg = sliding_agg(src, "event_ts", key_col, value_col, width, slide,
                          bug_compatible_stdev=bug_compatible_stdev)
    elif window_kind == "session":
        agg = session_agg(src, "event_ts", key_col, value_col, gap,
                          bug_compatible_stdev=bug_compatible_stdev)
    else:
        raise ValueError(f"unknown window kind {window_kind}")

    if sink is None:
        sink = ParquetLedgerSink(out_dir, event_ts_col="window_start")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    if await_termination:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
    return q, sink


def run_multi_width_pipeline(
    spark: SparkSession,
    clips_dir: str,
    out_root: str,
    checkpoint_root: str,
    widths: tuple[str, ...] = ("10 minutes", "1 hour", "12 hours"),
    key_col: str = "speaker_id",
    value_col: str = "dur_ms",
    watermark: str = "60 seconds",
    max_files_per_trigger: int = 4,
    await_termination: bool = True,
):
    """W4: the reference's three parallel feature groups (10m/1h/12h) fed from
    ONE clip topic — one StreamingQuery per width (each owns its window state
    and checkpoint), all subscribed to the same source directory, exactly like
    the three ``card_transactions_*_agg`` groups in the setup notebook
    (cells 4, 10-13).

    Returns {width_label: (query, sink)}.
    """
    from engine.windows import tumbling_agg, width_label

    out = {}
    for w in widths:
        lbl = width_label(w)
        src = read_clip_stream(
            spark, clips_dir, max_files_per_trigger=max_files_per_trigger,
            watermark=watermark,
        )
        agg = tumbling_agg(src, "event_ts", key_col, value_col, w)
        sink = ParquetLedgerSink(
            os.path.join(out_root, lbl), event_ts_col="window_start"
        )
        q = (
            agg.writeStream.outputMode("append")
            .queryName(f"width_{lbl}")
            .option("checkpointLocation", os.path.join(checkpoint_root, lbl))
            .foreachBatch(sink.foreach_batch())
            .start()
        )
        out[lbl] = (q, sink)
    if await_termination:
        for q, _ in out.values():
            q.processAllAvailable()
        for q, _ in out.values():
            q.stop()
    return out


def transcript_features(df: DataFrame) -> DataFrame:
    """Transcript-side feature extraction — pure JVM built-ins (no Python):
    token count (whitespace split) + character count per clip."""
    return df.select(
        "clip_id",
        "event_ts",
        F.size(F.split(F.col("transcript"), r"\s+")).alias("n_tokens"),
        F.length("transcript").alias("n_chars"),
    )


def run_join_pipeline(
    spark: SparkSession,
    clips_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "60 seconds",
    ttl: str = "10 minutes",
    max_files_per_trigger: int = 1,
    await_termination: bool = True,
    n_buckets: int | None = 128,
):
    """North-rule J6 pipeline: clip-feature stream ⋈ transcript-feature stream,
    keyed by ``clip_id``, state in the custom applyInPandasWithState store
    (engine.state.stateful_stream_join), exactly-once ledger sink.

    Both sides replay the same clip 'topic' through independent sources: side A
    decodes PCM (vectorized mapInPandas) into acoustic features; side B derives
    transcript stats JVM-side. Scale note: the union+groupBy shuffles once on
    clip_id; per-key state is bounded by the join TTL, not stream length.
    """
    from engine.audio import extract_audio_features_direct
    from engine.state import stateful_stream_join

    clip_side = read_clip_stream(
        spark, clips_dir, max_files_per_trigger=max_files_per_trigger, watermark=None
    )
    feats = (
        extract_audio_features_direct(clip_side)
        .select("clip_id", "event_ts", "rms", "peak", "decoded_dur_ms")
        .withWatermark("event_ts", watermark)
    )
    txt_side = read_clip_stream(
        spark, clips_dir, max_files_per_trigger=max_files_per_trigger, watermark=None
    )
    txts = transcript_features(txt_side).withWatermark("event_ts", watermark)

    joined = stateful_stream_join(
        feats, txts, "clip_id", "event_ts", ttl=ttl, n_buckets=n_buckets
    )
    sink = ParquetLedgerSink(out_dir, event_ts_col="left_ts")
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    if await_termination:
        q.processAllAvailable()
        q.stop()
        q.awaitTermination()
    return q, sink

