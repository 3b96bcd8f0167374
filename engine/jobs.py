"""spark-submit entry points (SURVEY.md §3.1-3.2 analogues).

The reference ships two jobs in one jar (``pom.xml:250`` mainClass plus
``SimProducer``): a paced synthetic producer and the windowed-aggregate
consumer, launched on a cluster from the Hopsworks UI (``README.md:10-28``).
Our equivalents are subcommands of this module, launched either as

    python -m engine.jobs <cmd> ...                      (local dev)
    spark-submit --master ... --py-files engine.zip \
        scripts/run_job.py <cmd> ...                     (cluster)

Subcommands
-----------
producer   materialize the clip 'topic' (deterministic synthetic audio+
           transcript table as ordered parquet chunks) — SimProducer analogue.
pipeline   rate-controlled stream → watermark → keyed window aggregate →
           exactly-once ledger sink — TransactionFraudExample analogue.
           ``--stateful`` switches the aggregation from the built-in
           ``window()`` operator to the custom applyInPandasWithState store.
join       dual-stream stateful join: clip features ⋈ transcript features
           keyed by clip_id (north rule J6).

Each job prints ONE JSON line with row counts, elapsed time, throughput, and
the sink audit, so cluster runs at different parallelism can be compared
directly (scaling-efficiency evidence, BASELINE.md).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] threads; ignored under spark-submit --master")
    p.add_argument("--shuffle-partitions", type=int, default=None)


def cmd_producer(args) -> dict:
    t0 = time.time()
    out = {
        "job": "producer", "out": args.out, "clips": args.n_clips,
        "files": args.n_files,
    }
    if args.iceberg:
        from engine.streams import write_clips_iceberg

        partition_by = (getattr(args, "partition_by", None)
                        or (["days(event_ts)"] if args.partition_days
                            else None))
        table = write_clips_iceberg(
            args.out, args.n_clips, n_files=args.n_files, seed=args.seed,
            files_per_snapshot=args.files_per_snapshot,
            jitter_ms=args.jitter_ms, max_dur_ms=args.max_dur_ms,
            mean_gap_ms=args.mean_gap_ms,
            partition_by=partition_by,
        )
        out["iceberg_snapshots"] = len(table.snapshots())
        out["partitioned"] = bool(partition_by)
    else:
        from engine.streams import write_clips_stream_dir

        write_clips_stream_dir(
            args.out, args.n_clips, n_files=args.n_files, seed=args.seed,
            jitter_ms=args.jitter_ms, max_dur_ms=args.max_dur_ms,
        )
    out["elapsed_sec"] = round(time.time() - t0, 3)
    return out


def cmd_pipeline(args) -> dict:
    from engine.session import get_spark
    from engine.sink import ParquetLedgerSink
    from engine.streams import read_clip_stream, run_window_pipeline

    spark = get_spark("pipeline", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    ckpt = args.checkpoint or os.path.join(args.out, "_checkpoint")

    # Iceberg source auto-detect: when --clips is an Iceberg table
    # (metadata/version-hint.text present), validate the append-only
    # invariant via the manifest planner and stream its validated source
    # path — the north rule's "reads an Iceberg table ... as a
    # rate-controlled stream". --day / --day-range turn the run into a
    # day-pruned streamed backfill over a days(event_ts)-partitioned topic:
    # only the matching partitions' files are listed or replayed.
    recursive = False
    day_filter = None
    if args.day or args.day_range or getattr(args, "partition", None):
        if not os.path.exists(
                os.path.join(args.clips, "metadata", "version-hint.text")):
            raise SystemExit(
                "--day/--day-range/--partition need a partitioned Iceberg "
                "topic (producer --iceberg --partition-days)")
    tail_table = None
    if os.path.exists(os.path.join(args.clips, "metadata", "version-hint.text")):
        from engine.iceberg import IcebergTable
        from engine.streams import iceberg_stream_source_path

        table = IcebergTable(args.clips)
        if args.day or args.day_range:
            day_fields = [f["name"] for f in table.spec_fields()
                          if f.get("transform") == "day"]
            if not day_fields:
                raise SystemExit(
                    f"topic {args.clips!r} has no days() partition field "
                    "(spec: "
                    f"{[f['name'] for f in table.spec_fields()]})")
            cond = (tuple(args.day_range) if args.day_range else args.day)
            day_filter = {day_fields[0]: cond}
        if getattr(args, "partition", None):
            # coerce by the table's PARTITION VALUE types — a blind int()
            # would turn an identity-string value like speaker '123' into
            # an int that matches nothing (a silent data miss on the tail
            # path, which has no matches-no-files guard)
            ptypes = table._partition_col_types()
            extra = {}
            for term in args.partition:
                if "=" not in term:
                    raise SystemExit(
                        f"--partition needs FIELD=VALUE, got {term!r}")
                k, v = term.split("=", 1)
                t_ = ptypes.get(k)  # unknown field → normalize raises
                if t_ in ("int", "long"):
                    try:
                        v = int(v)  # ordinals / identity ints
                    except ValueError:
                        pass  # ISO strings for time transforms
                elif t_ in ("float", "double"):
                    v = float(v)
                extra[k] = v
            day_filter = {**(day_filter or {}), **extra}
        if getattr(args, "tail", False):
            # snapshot-tail source: manifest-planned, no path rewrite —
            # the query keeps following commits made while it runs
            tail_table = table
        else:
            args.clips, recursive = iceberg_stream_source_path(
                table, partition_filter=day_filter)
    elif getattr(args, "tail", False):
        raise SystemExit("--tail requires an Iceberg topic (producer --iceberg)")

    def make_source(watermark):
        from engine.streams import read_clip_stream, read_clip_stream_tail

        if tail_table is not None:
            decode = bool(getattr(args, "decode", False))
            direct = bool(getattr(args, "payload_direct", False) and decode)
            # a python data source gets NO Catalyst column pruning — heavy
            # columns the pipeline never reads must be excluded HERE or
            # they cross the Arrow bridge at the ~750 MB/s transfer
            # ceiling. bytes ride only for in-frame decode (non-direct);
            # payload-direct instead carries the backing file path and the
            # decode stage reads payloads disk→numpy itself.
            heavy = {"bytes", "transcript"}
            needed = {args.key, args.value} | ({"bytes"}
                                               if decode and not direct
                                               else set())
            return read_clip_stream_tail(
                spark, tail_table,
                max_files_per_trigger=args.max_files_per_trigger,
                watermark=watermark, partition_filter=day_filter,
                progress_dir=os.path.join(ckpt, "_tail_progress"),
                exclude_columns=sorted(heavy - needed) or None,
                include_file_path=direct)
        return read_clip_stream(
            spark, args.clips,
            max_files_per_trigger=args.max_files_per_trigger,
            watermark=watermark, recursive=recursive)

    def extractor(sdf):
        from engine.audio import (
            extract_audio_features,
            extract_audio_features_direct,
            extract_speech_features,
        )

        if args.features == "speech":
            # mel/MFCC/pitch featurization (bytes ride the stream frame)
            return extract_speech_features(sdf)
        fe = extract_audio_features_direct if args.payload_direct else extract_audio_features
        return fe(sdf, spectral=(args.features == "spectral"))

    if args.decode and args.warmup:
        # Spawn python workers + compile codegen before the clock starts, so
        # sustained throughput is measured, not JVM/worker cold start.
        if tail_table is not None:
            warm = tail_table.read(
                spark, partition_filter=day_filter).limit(256)
        else:
            wreader = spark.read
            if recursive:
                wreader = wreader.option("recursiveFileLookup", "true")
            warm = wreader.parquet(args.clips).limit(256)
        extractor(warm).write.format("noop").mode("overwrite").save()

    t0 = time.time()
    if args.decode or args.stateful:
        from engine.state import stateful_session_agg, stateful_window_agg
        from engine.windows import session_agg, sliding_agg, tumbling_agg

        src = make_source(None)
        if args.decode:
            # end-to-end flagship: vectorized PCM decode feeds the aggregate.
            # Drop columns the window pipeline never reads (transcript) BEFORE
            # the mapInPandas stage — passthrough columns cross the Arrow
            # boundary twice, and mapInPandas gets no Catalyst pruning.
            # (The stream-stream join job keeps transcript; this is the
            # window-aggregate flagship only.)
            src = src.drop("transcript")
            src = extractor(src)
            args.value = "f0_hz" if args.features == "speech" else "rms"
        if not args.stateful:
            src = src.withWatermark("event_ts", args.watermark)
        if args.stateful:
            # exact-parity mode: operator owns the (widened) watermark
            if args.window == "session":
                agg = stateful_session_agg(
                    src, "event_ts", args.key, args.value, args.gap,
                    watermark=args.watermark, n_buckets=args.n_buckets,
                )
            else:
                slide = args.slide if args.window == "sliding" else None
                agg = stateful_window_agg(
                    src, "event_ts", args.key, args.value, args.width, slide=slide,
                    watermark=args.watermark, n_buckets=args.n_buckets,
                )
        elif args.window == "session":
            agg = session_agg(src, "event_ts", args.key, args.value, args.gap)
        elif args.window == "sliding":
            agg = sliding_agg(src, "event_ts", args.key, args.value, args.width, args.slide)
        else:
            agg = tumbling_agg(src, "event_ts", args.key, args.value, args.width)
        if args.iceberg_sink:
            from engine.iceberg import IcebergSink

            sink = IcebergSink(args.out)
        else:
            sink = ParquetLedgerSink(args.out, event_ts_col="window_start")
        q = (
            agg.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink.foreach_batch())
            .start()
        )
        q.processAllAvailable()
        q.stop()
    else:
        custom_sink = None
        if args.iceberg_sink:
            from engine.iceberg import IcebergSink

            custom_sink = IcebergSink(args.out)
        _, sink = run_window_pipeline(
            spark, args.clips, args.out, ckpt,
            window_kind=args.window, width=args.width, slide=args.slide,
            gap=args.gap, key_col=args.key, value_col=args.value,
            watermark=args.watermark,
            max_files_per_trigger=args.max_files_per_trigger,
            sink=custom_sink, recursive=recursive,
            source_df=(make_source(args.watermark)
                       if tail_table is not None else None),
        )
    elapsed = time.time() - t0
    if tail_table is not None:
        n_in = tail_table.read(spark, partition_filter=day_filter).count()
    else:
        reader = spark.read
        if recursive:
            reader = reader.option("recursiveFileLookup", "true")
        n_in = reader.parquet(args.clips).count()
    audit = sink.audit()
    try:
        out_rows = sink.read_committed(spark).count()
    except ValueError:  # legitimately empty input → zero committed batches
        out_rows = 0
    spark.stop()
    return {
        "job": "pipeline", "window": args.window, "stateful": args.stateful,
        "source": "tail" if tail_table is not None else "file",
        "day_filter": {k: str(v) for k, v in day_filter.items()} if day_filter else None,
        "decode": args.decode,
        "input_clips": n_in, "output_rows": out_rows,
        "elapsed_sec": round(elapsed, 3),
        "clips_per_sec": round(n_in / elapsed, 1),
        "exactly_once": audit["consistent"] and audit["unique_batch_ids"],
        "n_batches": audit["n_batches"],
    }


def cmd_join(args) -> dict:
    from engine.session import get_spark
    from engine.streams import run_join_pipeline

    spark = get_spark("join", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    ckpt = args.checkpoint or os.path.join(args.out, "_checkpoint")
    tail_table = None
    if getattr(args, "tail", False):
        from engine.iceberg import IcebergTable

        if not os.path.exists(
                os.path.join(args.clips, "metadata", "version-hint.text")):
            raise SystemExit("--tail requires an Iceberg topic "
                             "(producer --iceberg)")
        tail_table = IcebergTable(args.clips)
    t0 = time.time()
    _, sink = run_join_pipeline(
        spark, args.clips, args.out, ckpt, watermark=args.watermark,
        ttl=args.ttl, max_files_per_trigger=args.max_files_per_trigger,
        tail_table=tail_table,
    )
    elapsed = time.time() - t0
    if tail_table is not None:
        n_in = tail_table.read(spark).count()
    else:
        n_in = spark.read.parquet(args.clips).count()
    audit = sink.audit()
    try:
        out_rows = sink.read_committed(spark).count()
    except ValueError:  # legitimately empty input → zero committed batches
        out_rows = 0
    spark.stop()
    return {
        "job": "join", "input_clips": n_in, "joined_rows": out_rows,
        "elapsed_sec": round(elapsed, 3),
        "clips_per_sec": round(n_in / elapsed, 1),
        "exactly_once": audit["consistent"] and audit["unique_batch_ids"],
        "n_batches": audit["n_batches"],
    }


def cmd_serve(args) -> dict:
    """Online point-lookup serving (S7, ``VectorServer`` analogue) against a
    pipeline/backfill output: latest window row per key (ties broken on
    commit order, so re-backfills supersede older rows) — the CLI twin of
    ``featureView.getFeatureVector``.  One scan serves all keys; misses are
    reported per key, not fatal."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from engine.session import get_spark
    from engine.sink import ParquetLedgerSink

    spark = get_spark("serve", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    try:
        sink = ParquetLedgerSink(args.table, create=False)
        raw = [k for k in args.keys.split(",") if k != ""]
        try:
            online = sink.read_committed(spark, with_batch_id=True)
        except ValueError:
            # table exists but has no committed batches yet
            return {"job": "serve", "n_keys": len(set(raw)), "vectors": [],
                    "missing_keys": list(dict.fromkeys(raw))}

        # parse key values according to the key column's actual type
        key_type = dict(online.dtypes).get(args.key)
        if key_type in ("tinyint", "smallint", "int", "bigint"):
            keys = [int(k) for k in raw]
        elif key_type in ("float", "double"):
            keys = [float(k) for k in raw]
        else:
            keys = raw
        keys = list(dict.fromkeys(keys))  # dedupe, keep order

        # newest-row order: event/window ts when the table has one (pipeline
        # outputs), else commit order alone (e.g. the join pipeline's output)
        ts_col = getattr(args, "ts_col", None) or (
            "window_start" if "window_start" in online.columns else None
        )
        order = []
        if ts_col is not None:
            if ts_col not in online.columns:
                raise SystemExit(
                    f"--ts-col {ts_col!r} not in table columns {online.columns}"
                )
            order.append(F.desc(ts_col))
        order.append(F.desc("batch_id"))
        latest = (
            online.filter(F.col(args.key).isin(keys))
            .withColumn(
                "_rn",
                F.row_number().over(W.partitionBy(args.key).orderBy(*order)),
            )
            .filter("_rn = 1")
            .drop("_rn", "batch_id")
        )
        rows = {r[args.key]: r.asDict() for r in latest.collect()}
    finally:
        spark.stop()
    vectors, missing = [], []
    for k in keys:
        if k in rows:
            v = rows[k]
            for kk, vv in list(v.items()):
                if hasattr(vv, "isoformat"):
                    v[kk] = vv.isoformat()
            vectors.append(v)
        else:
            missing.append(k)
    return {"job": "serve", "n_keys": len(keys), "vectors": vectors,
            "missing_keys": missing}


def cmd_backfill(args) -> dict:
    """Batch backfill of the windowed feature groups from the historical clip
    table (the reference's backfill job, ``README.md:26-28``): same aggregate
    as the streaming pipeline, committed as one exactly-once ledger batch per
    width so time travel and serving read a consistent snapshot."""
    from pyspark.sql import functions as F

    from engine.session import get_spark
    from engine.sink import ParquetLedgerSink
    from engine.windows import multi_width_aggs

    spark = get_spark("backfill", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    t0 = time.time()
    clips = spark.read.parquet(args.clips).withColumn(
        "event_ts", F.col("event_ts").cast("timestamp")
    )
    widths = tuple(w.strip() for w in args.widths.split(",") if w.strip())
    aggs = multi_width_aggs(clips, "event_ts", args.key, args.value, widths=widths)
    out_rows = {}
    for lbl, agg in aggs.items():
        sink = ParquetLedgerSink(os.path.join(args.out, lbl),
                                 event_ts_col="window_start")
        batch_id = max((r.batch_id for r in sink.committed_batches()), default=-1) + 1
        sink.write_batch(agg, batch_id)
        out_rows[lbl] = sink.audit()["ledger_rows"]
    n_in = clips.count()
    spark.stop()
    return {
        "job": "backfill", "input_clips": n_in, "widths": list(out_rows),
        "rows_per_width": out_rows, "elapsed_sec": round(time.time() - t0, 3),
    }


def cmd_changes(args) -> dict:
    """CDC tail of a sink table's commit ledger: print one JSON line per
    committed batch (exactly-once across restarts via the checkpoint —
    ``ParquetLedgerSink.stream_committed``); the CLI twin of
    ``FeatureStore.stream_changes``."""
    from engine.session import get_spark
    from engine.sink import ParquetLedgerSink

    spark = get_spark("changes", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    sink = ParquetLedgerSink(args.table, create=False)
    ckpt = getattr(args, "checkpoint", None) or os.path.join(
        args.table, "_changes_checkpoint"
    )
    delivered = []

    def on_batch(batch_df, rec):
        row = {"batch_id": rec.batch_id, "commit_ts_ms": rec.commit_ts_ms,
               "row_count": rec.row_count, "mode": rec.mode,
               "read_rows": batch_df.count()}
        delivered.append(row)
        print(json.dumps({"change": row}), flush=True)

    sink.process_commits(spark, ckpt, on_batch, await_termination=True)
    spark.stop()
    return {"job": "changes", "table": args.table,
            "n_new_commits": len(delivered),
            "rows": sum(d["read_rows"] for d in delivered)}


def cmd_maintain(args) -> dict:
    """Iceberg table maintenance: bin-pack compaction of small data files
    (REPLACE snapshot, CDC-invisible) and/or snapshot expiration with
    reference-counted file GC — the scheduled housekeeping a per-batch
    exactly-once sink needs to stay scan-efficient and disk-bounded."""
    from engine.iceberg import IcebergTable
    from engine.session import get_spark

    t = IcebergTable(args.table)
    out = {"job": "maintain", "table": args.table}
    if args.compact_target_mb:
        spark = get_spark("maintain", cores=args.cores,
                          shuffle_partitions=args.shuffle_partitions)
        pre = len(t.plan_files())
        sid = t.compact_data_files(
            spark, target_file_bytes=args.compact_target_mb * 1024 * 1024,
            min_input_files=args.min_input_files,
        )
        spark.stop()
        out["compaction"] = {
            "snapshot_id": sid, "files_before": pre,
            "files_after": len(t.plan_files()),
            "purged_delete_files": (
                int(t.snapshot(sid)["summary"].get("removed-delete-files", 0))
                if sid is not None else 0),
        }
    if args.rewrite_manifests:
        def n_manifests():
            if t.current_snapshot_id is None:
                return 0  # empty table: nothing to rewrite
            return len(t._read_manifest_list(
                t.snapshot(t.current_snapshot_id)["manifest-list"]))

        pre_m = n_manifests()
        sid = t.rewrite_manifests()
        out["manifest_rewrite"] = {
            "snapshot_id": sid, "manifests_before": pre_m,
            "manifests_after": (n_manifests() if sid is not None else pre_m),
        }
    if args.expire_older_than_ms is not None or args.retain_last is not None:
        out["expiration"] = t.expire_snapshots(
            older_than_ms=args.expire_older_than_ms,
            retain_last=args.retain_last if args.retain_last is not None else 1,
        )
    if args.remove_orphans:
        out["orphans"] = t.remove_orphan_files(
            older_than_ms=args.orphans_older_than_ms,
            dry_run=args.orphans_dry_run,
        )
    return out


def cmd_lineage(args) -> dict:
    """Per-batch provenance for a finished (or running) pipeline: the
    checkpoint offset log joined to the sink's commit records — input
    offset range (tail offsets = input-table append-log coordinates),
    plan-time watermark, output rows / output Iceberg snapshot per batch.
    Durable-metadata only: no Spark session, works after the query died."""
    from engine.lineage import batch_lineage

    sink = None
    if args.sink:
        if os.path.exists(os.path.join(args.sink, "metadata",
                                       "version-hint.text")):
            from engine.iceberg import IcebergSink

            sink = IcebergSink(args.sink)
        else:
            from engine.sink import ParquetLedgerSink

            # create=False: a typo'd --sink path must raise, not scaffold
            # a bogus empty sink dir
            sink = ParquetLedgerSink(args.sink, create=False)
    lin = batch_lineage(args.checkpoint, sink)
    return {
        "job": "lineage", "checkpoint": args.checkpoint,
        "n_batches": len(lin),
        "completed": sum(1 for r in lin if r["completed"]),
        "batches": (lin if args.full
                    else lin[-args.last:] if args.last > 0 else []),
    }


def cmd_condition(args) -> dict:
    """Batch corpus conditioning over a documents table: quality filter ->
    exact fingerprint dedup -> deterministic sample -> overlapping token
    chunks, written as one exactly-once ledger batch so downstream training
    jobs read a consistent snapshot."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.sampling import deterministic_sample
    from engine.session import get_spark
    from engine.sink import ParquetLedgerSink
    from engine.text import chunk_documents, fingerprint, quality_score

    spark = get_spark("condition", cores=args.cores,
                      shuffle_partitions=args.shuffle_partitions)
    t0 = time.time()
    docs = spark.read.parquet(args.docs)
    n_in = docs.count()
    kept = quality_score(docs).filter(F.col("quality") >= args.min_quality)
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = (
        fingerprint(kept)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    sampled = deterministic_sample(deduped, args.fraction, salt=args.salt)
    chunks = chunk_documents(sampled, args.chunk_tokens, args.overlap)
    sink = ParquetLedgerSink(args.out)
    batch_id = max((r.batch_id for r in sink.committed_batches()), default=-1) + 1
    sink.write_batch(chunks, batch_id)
    n_out = sink.audit()["ledger_rows"]
    spark.stop()
    return {
        "job": "condition", "input_docs": n_in, "output_chunks": n_out,
        "min_quality": args.min_quality, "fraction": args.fraction,
        "chunk_tokens": args.chunk_tokens, "overlap": args.overlap,
        "elapsed_sec": round(time.time() - t0, 3),
    }


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="engine.jobs")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("producer", help="materialize the clip topic")
    p.add_argument("--out", required=True)
    p.add_argument("--n-clips", type=int, default=10_000)
    p.add_argument("--n-files", type=int, default=20)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--jitter-ms", type=int, default=30_000)
    p.add_argument("--max-dur-ms", type=int, default=1000)
    p.add_argument("--iceberg", action="store_true",
                   help="write the topic as an Iceberg v2 table "
                        "(manifest-planned snapshots over the same shards)")
    p.add_argument("--partition-days", action="store_true",
                   help="lay the Iceberg topic out partitioned by "
                        "days(event_ts) — the 10^12-clip deployment shape")
    p.add_argument("--partition-by", action="append", default=None,
                   metavar="TERM",
                   help="arbitrary Iceberg partition terms for the topic, "
                        "e.g. hours(event_ts) or 'bucket(8, speaker_id)' "
                        "(repeatable; overrides --partition-days)")
    p.add_argument("--mean-gap-ms", type=int, default=1000,
                   help="mean inter-clip gap (stretches the topic across days)")
    p.add_argument("--files-per-snapshot", type=int, default=None,
                   help="shards per Iceberg append snapshot (default: all in one)")
    p.set_defaults(fn=cmd_producer)

    p = sub.add_parser("serve", help="point-lookup feature vectors from a sink table")
    p.add_argument("--table", required=True, help="sink out dir (pipeline/backfill output)")
    p.add_argument("--key", default="speaker_id")
    p.add_argument("--keys", required=True, help="comma-separated key values")
    p.add_argument("--ts-col", default=None, dest="ts_col",
                   help="event/window ts column for newest-row ordering "
                        "(default: window_start when present, else commit order)")
    _add_common(p)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("changes", help="CDC tail of a sink table's commit ledger")
    p.add_argument("--table", required=True, help="sink out dir to tail")
    _add_common(p)
    p.set_defaults(fn=cmd_changes)

    p = sub.add_parser("maintain", help="Iceberg maintenance: compaction + snapshot expiration")
    p.add_argument("--table", required=True, help="Iceberg table location")
    p.add_argument("--compact-target-mb", type=int, default=0,
                   help="bin-pack files below this size (0 = skip compaction)")
    p.add_argument("--min-input-files", type=int, default=2)
    p.add_argument("--expire-older-than-ms", type=int, default=None,
                   help="expire snapshots older than this epoch-ms bound")
    p.add_argument("--retain-last", type=int, default=None,
                   help="always keep the N newest snapshots (enables expiration)")
    p.add_argument("--rewrite-manifests", action="store_true",
                   help="consolidate the manifest list (metadata-only; "
                        "planning-cost lever for long-running sink topics)")
    p.add_argument("--remove-orphans", action="store_true",
                   help="delete unreferenced files (crashed-write leftovers)")
    p.add_argument("--orphans-older-than-ms", type=int, default=None,
                   help="orphan mtime cutoff (default: now - 3 days)")
    p.add_argument("--orphans-dry-run", action="store_true",
                   help="list orphans without deleting")
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.set_defaults(fn=cmd_maintain)

    p = sub.add_parser("lineage", help="per-batch provenance: checkpoint "
                                       "offset log joined to sink commits")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--sink", default=None,
                   help="sink location (ledger dir or Iceberg table) to "
                        "join output-side facts")
    p.add_argument("--last", type=int, default=5,
                   help="show only the last N batches (default 5)")
    p.add_argument("--full", action="store_true", help="show every batch")
    p.set_defaults(fn=cmd_lineage)

    p = sub.add_parser("condition", help="corpus conditioning: quality -> dedup -> sample -> chunk")
    p.add_argument("--docs", required=True, help="documents parquet path")
    p.add_argument("--out", required=True, help="sink dir (chunks + ledger)")
    p.add_argument("--min-quality", type=float, default=0.6)
    p.add_argument("--fraction", type=float, default=1.0)
    p.add_argument("--salt", default="cond")
    p.add_argument("--chunk-tokens", type=int, default=64)
    p.add_argument("--overlap", type=int, default=16)
    _add_common(p)
    p.set_defaults(fn=cmd_condition)

    p = sub.add_parser("backfill", help="batch backfill of windowed feature groups")
    p.add_argument("--clips", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--widths", default="10 minutes,1 hour,12 hours")
    p.add_argument("--key", default="speaker_id")
    p.add_argument("--value", default="dur_ms")
    _add_common(p)
    p.set_defaults(fn=cmd_backfill)

    for name, fn in (("pipeline", cmd_pipeline), ("join", cmd_join)):
        p = sub.add_parser(name)
        p.add_argument("--clips", required=True, help="clip topic dir (producer output)")
        p.add_argument("--out", required=True, help="sink dir (data + ledger)")
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--watermark", default="60 seconds")
        p.add_argument("--max-files-per-trigger", type=int, default=4)
        _add_common(p)
        if name == "pipeline":
            p.add_argument("--window", choices=("tumbling", "sliding", "session"),
                           default="tumbling")
            p.add_argument("--width", default="10 minutes")
            p.add_argument("--slide", default="5 minutes")
            p.add_argument("--gap", default="2 minutes")
            p.add_argument("--key", default="speaker_id")
            p.add_argument("--value", default="dur_ms")
            p.add_argument("--stateful", action="store_true",
                           help="use the custom applyInPandasWithState store")
            p.add_argument("--n-buckets", type=int, default=None,
                           help="key-coarsened state layout bucket count "
                                "(for high-cardinality keys)")
            p.add_argument("--decode", action="store_true",
                           help="decode PCM (vectorized) and aggregate rms "
                                "instead of the metadata dur_ms column")
            p.add_argument("--features", choices=("basic", "spectral", "speech"),
                           default="basic",
                           help="acoustic feature set computed after decode")
            p.add_argument("--payload-direct", action="store_true",
                           help="read audio bytes straight from parquet in the "
                                "Python stage (JVM scans metadata only)")
            p.add_argument("--warmup", action=argparse.BooleanOptionalAction,
                           default=True,
                           help="pre-spawn workers/codegen before timing")
            p.add_argument("--iceberg-sink", action="store_true",
                           help="commit results as Iceberg v2 snapshots "
                                "instead of the parquet+ledger sink")
            p.add_argument("--day", default=None,
                           help="day-pruned streamed backfill: replay only "
                                "this day (ISO date or epoch-day int) of a "
                                "days(event_ts)-partitioned Iceberg topic")
            p.add_argument("--day-range", nargs=2, default=None,
                           metavar=("FROM", "TO"),
                           help="inclusive day range for the streamed backfill")
            p.add_argument("--partition", action="append", default=None,
                           metavar="FIELD=VALUE",
                           help="generic pruned-backfill filter on any "
                                "partition field (repeatable; composes with "
                                "--day), e.g. event_ts_hour=2024-01-01T06:00 "
                                "or speaker_id_bucket=c42")
            p.add_argument("--tail", action="store_true",
                           help="read the Iceberg topic via the snapshot-"
                                "tail source (manifest-planned, follows "
                                "live commits) instead of the validated "
                                "file source")
        else:
            p.add_argument("--ttl", default="10 minutes")
            p.add_argument("--tail", action="store_true",
                           help="read the Iceberg topic via the snapshot-"
                                "tail source on both join sides")
        p.set_defaults(fn=fn)
    return ap


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    result = args.fn(args)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
