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


def _partition_values(pdf, spec: list[tuple]) -> dict:
    """Partition-value columns for one shard pdf, per the table's spec
    fields. ``spec``: [(field_name, transform, source_col, param)] — the
    producer-side twin of ``IcebergTable._partition_exprs`` (numpy instead
    of Spark columns; same transforms, same values)."""
    import numpy as np

    from engine.iceberg import bucket_value, truncate_value

    out = {}
    for field, transform, source, param in spec:
        if transform in ("year", "month", "day", "hour"):
            unit = {"year": "Y", "month": "M", "day": "D", "hour": "h"}[transform]
            out[field] = (
                pdf[source].to_numpy()
                .astype(f"datetime64[{unit}]").astype("int64")
            )
        elif transform == "identity":
            out[field] = pdf[source].to_numpy()
        elif transform == "bucket":
            src = pdf[source]
            if src.dtype.kind in "iu":
                from engine.iceberg import _murmur3_32_long_np

                h = _murmur3_32_long_np(src.to_numpy().astype(np.int64))
                out[field] = (h.astype(np.int64) & 0x7FFFFFFF) % param
            else:
                out[field] = np.array([
                    bucket_value(v, "string", param) for v in src])
        elif transform == "truncate":
            src = pdf[source]
            kind = "long" if src.dtype.kind in "iu" else "string"
            out[field] = np.array([
                truncate_value(v, kind, param) for v in src])
        else:
            raise ValueError(f"unknown partition transform {transform!r}")
    return out


def _write_clip_file(args) -> list[tuple[str, dict | None]]:
    """One producer shard: generate [start, start+n) deterministically and
    write parquet — a single flat file for unpartitioned topics, or one
    file per partition tuple under ``__p_field=value/`` dirs (the Iceberg
    partitioned layout) when ``spec`` is set. Top-level so multiprocessing
    can pickle it. Returns [(path, partition_dict_or_None)]."""
    dir_path, i, start, n, seed, kw, spec = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.synth import make_clips_pdf

    pdf = make_clips_pdf(n, seed=seed, start_index=start, **kw)
    schema = pa.schema([(name, pa.type_for_alias(t)) for name, t in _CLIP_PA_SCHEMA_FIELDS])
    if not spec:
        table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
        out = os.path.join(dir_path, f"part-{i:05d}.parquet")
        pq.write_table(table, out)
        return [(out, None)]
    import pandas as _pd

    pvals = _partition_values(pdf, spec)
    key = _pd.MultiIndex.from_arrays(
        [pvals[f] for f, *_ in spec], names=[f for f, *_ in spec])
    written: list[tuple[str, dict]] = []
    for j, (tup, g) in enumerate(sorted(
            pdf.groupby(key, sort=True), key=lambda kv: str(kv[0]))):
        tup = tup if isinstance(tup, tuple) else (tup,)
        part = {f: (v.item() if hasattr(v, "item") else v)
                for (f, *_), v in zip(spec, tup)}
        sub = os.path.join(
            dir_path, *[f"__p_{f}={v}" for f, v in part.items()])
        os.makedirs(sub, exist_ok=True)
        out = os.path.join(sub, f"part-{i:05d}-{j:03d}.parquet")
        table = pa.Table.from_pandas(
            g.reset_index(drop=True), schema=schema, preserve_index=False)
        pq.write_table(table, out)
        written.append((out, part))
    return written


def write_clips_stream_dir(
    dir_path: str, n_clips: int, n_files: int = 20, seed: int = 42,
    parallelism: int | None = None, _spec: list | None = None, **kw
):
    """Materialize the clip table as ``n_files`` parquet chunks in arrival
    order — the replayable 'topic'. (Producer job, ``SimProducer.java:24-47``.)

    Shards are generated in parallel processes; each shard's rng derives from
    ``(seed, start_index)`` (engine.synth.make_clips_pdf), so output is
    deterministic regardless of parallelism.

    ``_spec`` (internal, set by :func:`write_clips_iceberg`) routes each
    shard's rows into the Iceberg partitioned layout (``__p_field=value/``
    subdirs, one file per partition tuple per shard) and switches the
    return value to ``[(path, partition_dict)]``; without it the layout is
    flat and the dir path is returned."""
    import shutil

    os.makedirs(dir_path, exist_ok=True)
    for stale in os.listdir(dir_path):  # rewriting the topic: drop old shards
        p = os.path.join(dir_path, stale)
        if stale.startswith("part-") and stale.endswith(".parquet"):
            os.remove(p)
        elif stale.startswith("__p_") and os.path.isdir(p):
            shutil.rmtree(p)
    chunk = (n_clips + n_files - 1) // n_files
    tasks = []
    for i in range(n_files):
        start = i * chunk
        n = min(chunk, n_clips - start)
        if n <= 0:
            break
        tasks.append((dir_path, i, start, n, seed, kw, _spec))
    if parallelism is None:
        parallelism = min(len(tasks), max(1, (os.cpu_count() or 4) // 2))
    if parallelism <= 1 or len(tasks) <= 1:
        shards = [_write_clip_file(t) for t in tasks]
    else:
        import multiprocessing as mp

        with mp.Pool(parallelism) as pool:
            shards = pool.map(_write_clip_file, tasks)
    results = [fp for shard in shards for fp in shard]
    # Spark's file stream source replays in modification-time order; parallel
    # shard writes finish out of order, so stamp monotone mtimes to preserve
    # arrival order (the 'topic offset' order). Basename order = (shard,
    # within-shard partition group) — event order, since event_ts is
    # monotone in the global clip index.
    ordered = sorted((p for p, _ in results), key=os.path.basename)
    base = int(time.time()) - len(ordered) - 10
    for i, p in enumerate(ordered):
        os.utime(p, (base + i, base + i))
    return results if _spec is not None else dir_path


def write_clips_iceberg(
    location: str, n_clips: int, n_files: int = 20, seed: int = 42,
    files_per_snapshot: int | None = None, parallelism: int | None = None,
    partition_by: list[str] | None = None,
    **kw,
):
    """The clip + transcript table AS an Iceberg v2 table (north rule:
    "reads an Iceberg table of audio clip + transcript pairs").

    The deterministic producer shards land in the table's ``data/`` dir
    (same bytes as :func:`write_clips_stream_dir`); metadata commits group
    them ``files_per_snapshot`` at a time into append snapshots. Batch
    readers plan via manifests (``IcebergTable.read``); the rate-controlled
    stream replays the same committed files in arrival order via
    :func:`read_clip_stream_iceberg`. Returns the ``IcebergTable``.

    ``partition_by`` (e.g. ``["days(event_ts)"]`` — the 10^12-clip topic's
    deployment shape; identity/bucket/truncate terms also accepted) lays
    the topic out partitioned: producer shards split per partition tuple
    into ``__p_field=value/`` subdirs, manifests carry the typed partition
    values, and both the batch reader and the stream can day-prune
    (reference analogue: the partition-key feature flag,
    ``base/Feature.java:40-136``)."""
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from engine.iceberg import DataFileInfo, IcebergTable, file_column_bounds

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
    table = IcebergTable(location, schema=spark_schema,
                         partition_by=partition_by)
    spec_fields = table.spec_fields()
    if not spec_fields:
        write_clips_stream_dir(table.data_dir, n_clips, n_files=n_files,
                               seed=seed, parallelism=parallelism, **kw)
        entries = [
            (os.path.join(table.data_dir, n), None)
            for n in sorted(
                n for n in os.listdir(table.data_dir)
                if n.startswith("part-") and n.endswith(".parquet"))
        ]
    else:
        schema_by_id = {
            f["id"]: f for f in table.schema_json()["fields"]}
        spec = []
        for f in spec_fields:
            tr = f.get("transform", "identity")
            if tr.startswith("bucket["):
                transform, param = "bucket", int(tr[len("bucket["):-1])
            elif tr.startswith("truncate["):
                transform, param = "truncate", int(tr[len("truncate["):-1])
            else:
                transform, param = tr, None
            spec.append((f["name"], transform,
                         schema_by_id[f["source-id"]]["name"], param))
        entries = sorted(
            write_clips_stream_dir(
                table.data_dir, n_clips, n_files=n_files, seed=seed,
                parallelism=parallelism, _spec=spec, **kw),
            key=lambda e: os.path.basename(e[0]),
        )
    schema_fields = table.schema_json()["fields"]
    per_snap = files_per_snapshot or len(entries) or 1
    for i in range(0, len(entries), per_snap):
        infos = []
        for p, part in entries[i:i + per_snap]:
            lower, upper = file_column_bounds(p, schema_fields)
            infos.append(DataFileInfo(
                file_path=p,
                record_count=pq.read_metadata(p).num_rows,
                file_size_in_bytes=os.path.getsize(p),
                partition=part,
                lower_bounds=lower or None,
                upper_bounds=upper or None,
            ))
        table.commit_append(infos)
    return table


_GLOB_UNSAFE = set("*?[]{},\\")


def iceberg_stream_source_path(table, partition_filter: dict | None = None
                               ) -> tuple[str, bool]:
    """Validate an Iceberg clip table for file-source streaming and return
    ``(source_path, recursive)`` for :func:`read_clip_stream`.

    The file source replays whatever sits under the path, so exactness
    requires planned files == on-disk files there.  Three layouts:

    - **unpartitioned**: every live file sits flat in ``data/`` exactly
      once (files are moved in before their snapshot commits) — returns
      ``data/`` itself, non-recursive.
    - **partitioned, no filter**: files live in ``__p_field=value/``
      subdirs — returns ``data/`` with ``recursiveFileLookup`` (partition
      values stay IN the files per the Iceberg layout, so directory
      discovery is unnecessary).
    - **partitioned + partition_filter**: manifest-level pruning picks the
      matching partition dirs; returns a per-level brace glob (Hadoop glob
      alternation) covering EXACTLY those dirs — the day-pruned streamed
      backfill never lists, opens, or replays any other day's files.
      The pruned dir set must be rectangular across levels (a glob is a
      cross product) and each matched dir must hold only planned files;
      both are validated here, failing fast rather than over-replaying."""
    from engine.iceberg import IcebergTable

    if isinstance(table, str):
        table = IcebergTable(table)
    planned = {f.file_path for f in
               table.plan_files(partition_filter=partition_filter)}
    spec = table.spec_fields()

    def check_exact(on_disk: set[str], scope: str) -> None:
        if planned != on_disk:
            raise ValueError(
                f"iceberg table {table.location!r} is not append-only-clean "
                f"under {scope}: {len(on_disk - planned)} uncommitted and "
                f"{len(planned - on_disk)} missing data files — stream "
                "requires planned files == on-disk contents"
            )

    if not spec:
        if partition_filter:
            raise ValueError("partition_filter on an unpartitioned table")
        on_disk = {
            os.path.join(table.data_dir, n)
            for n in os.listdir(table.data_dir) if n.endswith(".parquet")
        }
        check_exact(on_disk, "data/")
        return table.data_dir, False

    if partition_filter is None:
        on_disk = {
            os.path.join(root, n)
            for root, _dirs, names in os.walk(table.data_dir)
            for n in names if n.endswith(".parquet")
        }
        check_exact(on_disk, "data/ (recursive)")
        return table.data_dir, True

    if not planned:
        raise ValueError(
            f"partition_filter {partition_filter!r} matches no files — "
            "nothing to stream"
        )
    dirs = {os.path.dirname(p) for p in planned}
    on_disk = {
        os.path.join(d, n)
        for d in dirs for n in os.listdir(d) if n.endswith(".parquet")
    }
    check_exact(on_disk, "the pruned partition dirs")
    rels = sorted(os.path.relpath(d, table.data_dir) for d in dirs)
    comps = [r.split(os.sep) for r in rels]
    depth = len(comps[0])
    level_vals = [sorted({c[j] for c in comps}) for j in range(depth)]
    for vals in level_vals:
        for v in vals:
            if _GLOB_UNSAFE & set(v):
                raise ValueError(
                    f"partition dir {v!r} contains glob metacharacters — "
                    "stream this partition via its literal dir path instead"
                )
    # a glob is the cross product of its levels; refuse non-rectangular
    # prunes (would silently replay partitions outside the filter)
    from itertools import product

    rect = {os.sep.join(t) for t in product(*level_vals)}
    matched = {
        r for r in (
            os.path.relpath(root, table.data_dir)
            for root, _dirs, names in os.walk(table.data_dir)
            if any(n.endswith(".parquet") for n in names))
        if r in rect
    }
    if matched != set(rels):
        raise ValueError(
            f"partition filter prunes a non-rectangular dir set "
            f"({sorted(matched - set(rels))} also match the glob) — "
            "stream per partition dir instead"
        )
    glob_parts = [
        vals[0] if len(vals) == 1 else "{" + ",".join(vals) + "}"
        for vals in level_vals
    ]
    return os.path.join(table.data_dir, *glob_parts), True


def iceberg_stream_data_dir(table) -> str:
    """Back-compat wrapper: the validated stream source path for the whole
    table (see :func:`iceberg_stream_source_path`). Only valid for
    unpartitioned tables, where the path needs no recursive lookup."""
    path, recursive = iceberg_stream_source_path(table)
    if recursive:
        raise ValueError(
            "partitioned table: use iceberg_stream_source_path() / "
            "read_clip_stream_iceberg(), which carry the recursive-lookup "
            "flag the file source needs for __p_*=value subdirs"
        )
    return path


def read_clip_stream_iceberg(
    spark: SparkSession,
    table,
    max_files_per_trigger: int = 1,
    watermark: str = "60 seconds",
    ts_col: str = "event_ts",
    partition_filter: dict | None = None,
) -> DataFrame:
    """Rate-controlled stream over an Iceberg clip table (see
    :func:`iceberg_stream_source_path` for why the file source over the
    validated path is exact). ``partition_filter`` streams ONLY the
    matching partitions' files — the day-pruned streamed backfill over a
    ``days(event_ts)``-partitioned topic. With the Iceberg runtime jar
    present, ``readStream.format("iceberg")`` replaces this source behind
    the same table layout."""
    path, recursive = iceberg_stream_source_path(
        table, partition_filter=partition_filter)
    return read_clip_stream(spark, path,
                            max_files_per_trigger=max_files_per_trigger,
                            watermark=watermark, ts_col=ts_col,
                            recursive=recursive)


def read_clip_stream_tail(
    spark: SparkSession,
    table,
    max_files_per_trigger: int = 1,
    watermark: str = "60 seconds",
    ts_col: str = "event_ts",
    partition_filter: dict | None = None,
    progress_dir: str | None = None,
    starting_snapshot_id: int | None = None,
    exclude_columns: list[str] | None = None,
    include_file_path: bool = False,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Clip stream over the SNAPSHOT-TAIL source (engine/tail.py) instead
    of the validated file source: plans from manifests (no directory
    listing or planned==on-disk restriction), follows commits made WHILE
    the query runs, prunes partitions at the manifest level with no
    rectangularity requirement, and records exact per-batch lineage as
    (snapshot, position) offsets.  ``progress_dir`` should live with the
    query's checkpoint dir (restart-safety high-water sidecar);
    ``partition_filter`` uses plan_files semantics (tuples OK — they are
    carried as JSON ranges)."""
    import json as _json

    from engine.iceberg import IcebergTable
    from engine.tail import register_tail_source

    if isinstance(table, str):
        table = IcebergTable(table)
    register_tail_source(spark)
    reader = (spark.readStream.format("iceberg_tail")
              .option("location", table.location)
              .option("max_files_per_trigger", str(max_files_per_trigger)))
    if partition_filter:
        flt = {c: ({"lo": v[0], "hi": v[1]}
                   if isinstance(v, tuple) and len(v) == 2 else
                   list(v) if isinstance(v, (set, frozenset)) else v)
               for c, v in partition_filter.items()}
        reader = reader.option("partition_filter", _json.dumps(flt))
    if progress_dir:
        reader = reader.option("progress_dir", progress_dir)
    if starting_snapshot_id is not None:
        reader = reader.option("starting_snapshot_id",
                               str(starting_snapshot_id))
    if exclude_columns:
        reader = reader.option("exclude_columns", ",".join(exclude_columns))
    if include_file_path:
        reader = reader.option("include_file_path", "true")
    if max_bytes_per_trigger is not None:
        reader = reader.option("max_bytes_per_trigger",
                               str(max_bytes_per_trigger))
    stream = reader.load()
    if watermark is not None:
        stream = stream.withWatermark(ts_col, watermark)
    return stream


def read_clip_stream(
    spark: SparkSession,
    dir_path: str,
    max_files_per_trigger: int = 1,
    watermark: str = "60 seconds",
    ts_col: str = "event_ts",
    recursive: bool = False,
) -> DataFrame:
    """S1 analogue: subscribe to the clip 'topic' from the earliest offset with
    a bounded out-of-orderness watermark (W2). ``recursive`` turns on
    ``recursiveFileLookup`` for partitioned (``__p_*=value/``) topic
    layouts — partition values stay in the files, so no directory
    inference is needed."""
    reader = (
        spark.readStream.schema(CLIP_SCHEMA_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    stream = reader.parquet(dir_path)
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
    recursive: bool = False,
    source_df: DataFrame | None = None,
):
    """The flagship streaming job (TransactionFraudExample analogue):
    rate-controlled source → watermark → keyed window agg → exactly-once sink.

    ``sink`` overrides the default ``ParquetLedgerSink`` with any object
    exposing the same ``foreach_batch``/``audit``/``read_committed``
    protocol (e.g. ``engine.iceberg.IcebergSink``). ``recursive`` is the
    partitioned-topic-layout flag (see :func:`read_clip_stream`).
    ``source_df`` substitutes a prebuilt streaming source (e.g.
    :func:`read_clip_stream_tail`) — it must already carry its watermark;
    ``clips_dir``/``max_files_per_trigger``/``recursive`` are ignored.

    Returns (StreamingQuery, sink).
    """
    src = source_df if source_df is not None else read_clip_stream(
        spark, clips_dir, max_files_per_trigger=max_files_per_trigger,
        watermark=watermark, recursive=recursive,
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
    tail_table=None,
):
    """W4: the reference's three parallel feature groups (10m/1h/12h) fed from
    ONE clip topic — one StreamingQuery per width (each owns its window state
    and checkpoint), all subscribed to the same source directory, exactly like
    the three ``card_transactions_*_agg`` groups in the setup notebook
    (cells 4, 10-13).

    ``tail_table`` subscribes each width to its own snapshot-tail of the
    Iceberg topic instead (per-width progress sidecars, bytes/transcript
    pruned at the source — the metadata aggregate never ships payloads).

    Returns {width_label: (query, sink)}.
    """
    from engine.windows import tumbling_agg, width_label

    out = {}
    for w in widths:
        lbl = width_label(w)
        if tail_table is not None:
            src = read_clip_stream_tail(
                spark, tail_table,
                max_files_per_trigger=max_files_per_trigger,
                watermark=watermark,
                progress_dir=os.path.join(
                    checkpoint_root, lbl, "_tail_progress"),
                exclude_columns=sorted(
                    {"bytes", "transcript"} - {key_col, value_col}))
        else:
            src = read_clip_stream(
                spark, clips_dir,
                max_files_per_trigger=max_files_per_trigger,
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
    tail_table=None,
):
    """North-rule J6 pipeline: clip-feature stream ⋈ transcript-feature stream,
    keyed by ``clip_id``, state in the custom applyInPandasWithState store
    (engine.state.stateful_stream_join), exactly-once ledger sink.

    Both sides replay the same clip 'topic' through independent sources: side A
    decodes PCM (vectorized mapInPandas) into acoustic features; side B derives
    transcript stats JVM-side. Scale note: the union+groupBy shuffles once on
    clip_id; per-key state is bounded by the join TTL, not stream length.

    ``tail_table`` switches both sides to independent snapshot-tail
    sources over the Iceberg topic (engine/tail.py; own progress
    sidecars), each pruned to exactly its columns at the source: the
    clip side carries ``__file_path`` instead of bytes (payload-direct
    decode), the transcript side drops bytes entirely.
    """
    from engine.audio import extract_audio_features_direct
    from engine.state import stateful_stream_join

    if tail_table is not None:
        clip_side = read_clip_stream_tail(
            spark, tail_table, max_files_per_trigger=max_files_per_trigger,
            watermark=None,
            progress_dir=os.path.join(checkpoint_dir, "_tail_progress_clip"),
            exclude_columns=["bytes", "transcript"], include_file_path=True)
        txt_side = read_clip_stream_tail(
            spark, tail_table, max_files_per_trigger=max_files_per_trigger,
            watermark=None,
            progress_dir=os.path.join(checkpoint_dir, "_tail_progress_txt"),
            exclude_columns=["bytes"])
    else:
        clip_side = read_clip_stream(
            spark, clips_dir, max_files_per_trigger=max_files_per_trigger,
            watermark=None)
        txt_side = read_clip_stream(
            spark, clips_dir, max_files_per_trigger=max_files_per_trigger,
            watermark=None)
    feats = (
        extract_audio_features_direct(clip_side)
        .select("clip_id", "event_ts", "rms", "peak", "decoded_dur_ms")
        .withWatermark("event_ts", watermark)
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

