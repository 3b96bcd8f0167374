"""Streaming correctness harness (SURVEY.md §5.2 item 4):
- batch == stream invariant for the windowed aggregate,
- exactly-once sink: replayed batch ids no-op, audit is consistent,
- kill mid-stream + restart from checkpoint → no dupes, no gaps,
- watermark late-drop: closed windows don't reopen.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from engine.sink import ParquetLedgerSink
from engine.streams import (
    read_clip_stream,
    run_window_pipeline,
    write_clips_stream_dir,
)
from engine.windows import tumbling_agg


@pytest.fixture(scope="module")
def clips_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream") / "clips")
    # ordered-ish event time: jitter 30s < 60s watermark keeps every row
    write_clips_stream_dir(d, n_clips=2000, n_files=10, seed=42, jitter_ms=30_000)
    return d


def _run(spark, clips_dir, tmp, kind="tumbling", **kw):
    out = os.path.join(tmp, f"out_{kind}")
    ckpt = os.path.join(tmp, f"ckpt_{kind}")
    q, sink = run_window_pipeline(
        spark, clips_dir, out, ckpt, window_kind=kind,
        max_files_per_trigger=2, **kw,
    )
    return sink


def test_stream_matches_batch_tumbling(spark, clips_dir, tmp_path):
    sink = _run(spark, clips_dir, str(tmp_path))
    got = sink.read_committed(spark)
    batch = spark.read.parquet(clips_dir)
    want = tumbling_agg(batch, "event_ts", "speaker_id", "dur_ms", "10 minutes")
    # The final window(s) past the last watermark never fire in append mode;
    # compare on the windows the stream emitted — they must match batch exactly,
    # and the stream must have emitted all windows ending before max_ts - 60s.
    gp = got.toPandas().set_index(["window_start", "speaker_id"]).sort_index()
    wp = want.toPandas().set_index(["window_start", "speaker_id"]).sort_index()
    assert len(gp) > 0
    missing = gp.index.difference(wp.index)
    assert len(missing) == 0  # every emitted row exists in batch result
    import pandas as pd

    pd.testing.assert_frame_equal(wp.loc[gp.index], gp, check_exact=False, rtol=1e-9)
    # completeness: all windows closed by the final watermark were emitted
    max_ts = batch.agg(F.max("event_ts")).collect()[0][0]
    closed = wp[wp.index.get_level_values("window_start").map(
        lambda t: (max_ts - t).total_seconds() > 600 + 60
    )]
    assert closed.index.isin(gp.index).all()


def test_exactly_once_replay_noop(spark, clips_dir, tmp_path):
    out = str(tmp_path / "once")
    sink = ParquetLedgerSink(out)
    df = spark.read.parquet(clips_dir).select("clip_id", "speaker_id")
    assert sink.write_batch(df, 0) is True
    n1 = sink.read_committed(spark).count()
    assert sink.write_batch(df, 0) is False  # replay short-circuits
    assert sink.read_committed(spark).count() == n1
    audit = sink.audit()
    assert audit["unique_batch_ids" ] and audit["consistent"]


def test_kill_restart_no_dupes_no_gaps(spark, clips_dir, tmp_path):
    out = str(tmp_path / "kr_out")
    ckpt = str(tmp_path / "kr_ckpt")
    sink = ParquetLedgerSink(out, event_ts_col="window_start")

    src = read_clip_stream(spark, clips_dir, max_files_per_trigger=1)
    agg = tumbling_agg(src, "event_ts", "speaker_id", "dur_ms", "10 minutes")

    # phase 1: process a few micro-batches then kill mid-stream
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    import time

    # bounded wait; a query that dies on its own under load IS the kill
    # this test performs — a persistent failure resurfaces loudly in the
    # restarted query's processAllAvailable below
    deadline = time.time() + 120
    while len(sink.committed_batches()) < 3 and q.isActive:
        if time.time() > deadline:
            break
        time.sleep(0.2)
    q.stop()  # kill mid-stream

    # phase 2: restart from the same checkpoint → must resume, not redo
    q2 = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q2.processAllAvailable()
    q2.stop()

    audit = sink.audit()
    assert audit["unique_batch_ids"] and audit["consistent"]

    # no dupes/gaps: resumed run equals a single uninterrupted run
    out2 = str(tmp_path / "ref_out")
    ckpt2 = str(tmp_path / "ref_ckpt")
    _, ref_sink = run_window_pipeline(
        spark, clips_dir, out2, ckpt2, max_files_per_trigger=1
    )
    a = sink.read_committed(spark).orderBy("window_start", "speaker_id").toPandas()
    b = ref_sink.read_committed(spark).orderBy("window_start", "speaker_id").toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True),
        check_exact=False, rtol=1e-9,
    )


def test_session_and_sliding_streaming_smoke(spark, clips_dir, tmp_path):
    s1 = _run(spark, clips_dir, str(tmp_path), kind="sliding")
    assert s1.read_committed(spark).count() > 0
    s2 = _run(spark, clips_dir, str(tmp_path), kind="session", gap="2 minutes")
    assert s2.audit()["consistent"]


def test_row_paced_replay(spark, clips_dir, tmp_path):
    """rate-micro-batch pacing: fixed rows per batch, full table delivered."""
    import time

    from engine.sink import ParquetLedgerSink
    from engine.streams import read_clip_stream_paced
    from engine.windows import tumbling_agg

    n = spark.read.parquet(clips_dir).count()
    src = read_clip_stream_paced(spark, clips_dir, rows_per_batch=500)
    sink = ParquetLedgerSink(str(tmp_path / "paced_out"))
    q = (
        src.select("clip_id", "event_ts", "speaker_id")
        .writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "paced_ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        recs = sink.committed_batches()
        if sum(r.row_count for r in recs) >= n:
            break
        time.sleep(0.5)
    q.stop()
    got = sink.read_committed(spark)
    assert got.count() == n
    assert got.select("clip_id").distinct().count() == n
    # pacing honored: no committed batch exceeded rows_per_batch
    assert max(r.row_count for r in sink.committed_batches()) <= 500


def test_multi_width_pipeline(spark, clips_dir, tmp_path):
    """W4: three widths fed from one topic, each matching its batch twin."""
    from engine.streams import run_multi_width_pipeline
    from engine.windows import tumbling_agg, width_label

    res = run_multi_width_pipeline(
        spark, clips_dir, str(tmp_path / "out"), str(tmp_path / "ckpt"),
        widths=("10 minutes", "1 hour"),
    )
    batch = spark.read.parquet(clips_dir)
    for w in ("10 minutes", "1 hour"):
        _, sink = res[width_label(w)]
        got = sink.read_committed(spark).toPandas()
        assert len(got) > 0
        want = tumbling_agg(batch, "event_ts", "speaker_id", "dur_ms", w).toPandas()
        gp = got.set_index(["window_start", "speaker_id"]).sort_index()
        wp = want.set_index(["window_start", "speaker_id"]).sort_index()
        assert len(gp.index.difference(wp.index)) == 0
        import pandas as pd

        pd.testing.assert_frame_equal(wp.loc[gp.index], gp, check_exact=False, rtol=1e-9)


def test_streaming_dedup(spark, clips_dir, tmp_path):
    """Duplicated stream (two subscriptions unioned) → exactly one row per
    clip_id survives; state bounded by the watermark."""
    from engine.dedup import streaming_dedup
    from engine.sink import ParquetLedgerSink
    from engine.streams import read_clip_stream

    a = read_clip_stream(spark, clips_dir, max_files_per_trigger=2, watermark=None)
    b = read_clip_stream(spark, clips_dir, max_files_per_trigger=2, watermark=None)
    dup = a.unionByName(b).select("clip_id", "event_ts", "speaker_id")
    ded = streaming_dedup(dup, ["clip_id"], ts_col="event_ts")
    sink = ParquetLedgerSink(str(tmp_path / "dd_out"))
    q = (
        ded.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
        .foreachBatch(sink.foreach_batch())
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sink.read_committed(spark)
    n = spark.read.parquet(clips_dir).count()
    assert got.count() == n
    assert got.select("clip_id").distinct().count() == n


def test_serving_over_streamed_output(spark, clips_dir, tmp_path):
    """North-star loop closed: stream → windowed agg → exactly-once sink →
    online point lookups (VectorServer) against the committed output."""
    from engine.serving import VectorServer
    from engine.streams import run_window_pipeline

    out = str(tmp_path / "serve_out")
    ckpt = str(tmp_path / "serve_ckpt")
    _, sink = run_window_pipeline(spark, clips_dir, out, ckpt,
                                  max_files_per_trigger=4)
    online = sink.read_committed(spark)
    # latest window per speaker = the online feature-group row
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F2

    latest = (
        online.withColumn(
            "_rn",
            F2.row_number().over(
                W.partitionBy("speaker_id").orderBy(F2.desc("window_start"))
            ),
        )
        .filter("_rn = 1")
        .drop("_rn")
    )
    vs = VectorServer([("agg_10m", latest, ["speaker_id"])])
    some = [r.speaker_id for r in latest.select("speaker_id").limit(3).collect()]
    for sid in some:
        vec = vs.get_feature_vector({"speaker_id": sid})
        assert vec["speaker_id"] == sid
        assert vec["num_trans_per_10m"] >= 1
    batch_rows = vs.get_feature_vectors(
        spark, [{"speaker_id": s} for s in some]
    )
    assert batch_rows.count() == len(some)


def test_sink_rejects_out_dir_reuse_with_new_checkpoint(spark, clips_dir, tmp_path):
    """Reusing an out_dir with a fresh checkpoint restarts batch ids — the
    sink must fail loudly instead of silently no-opping (review regression)."""
    from engine.streams import run_window_pipeline

    out = str(tmp_path / "reuse_out")
    _, sink1 = run_window_pipeline(spark, clips_dir, out, str(tmp_path / "ck1"),
                                   max_files_per_trigger=4)
    before = [r.lineage for r in sink1.committed_batches()]
    with pytest.raises(Exception):  # guard surfaces wrapped in StreamingQueryException
        # new checkpoint, different batching → batch 0 covers different files
        run_window_pipeline(spark, clips_dir, out, str(tmp_path / "ck2"),
                            max_files_per_trigger=1)
    after = [r.lineage for r in sink1.committed_batches()]
    assert after == before  # nothing overwritten or silently dropped


def test_producer_rewrite_clears_stale_shards(tmp_path):
    import os

    from engine.streams import write_clips_stream_dir

    d = str(tmp_path / "topic")
    write_clips_stream_dir(d, 400, n_files=8, seed=1)
    assert len(os.listdir(d)) == 8
    write_clips_stream_dir(d, 200, n_files=4, seed=1)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 4  # old shards removed


def test_day_pruned_backfill_kill_restart(spark, tmp_path):
    """VERDICT r4 #7: the day-pruned streamed backfill must survive a
    mid-stream kill — restart from the same checkpoint resumes the SAME
    pruned day (no dupes, no gaps, ledger audit green), and the result
    equals a batch aggregate over the pruned day's committed rows."""
    import time as _time

    from engine.streams import (
        read_clip_stream,
        iceberg_stream_source_path,
        write_clips_iceberg,
    )
    from engine.windows import tumbling_agg

    loc = str(tmp_path / "bf_topic")
    # ~2 days of clips at 150 s mean gap
    t = write_clips_iceberg(loc, 1200, n_files=10, seed=11,
                            files_per_snapshot=5, mean_gap_ms=150_000,
                            jitter_ms=10_000,
                            partition_by=["days(event_ts)"])
    day = sorted({f.partition["event_ts_day"]
                  for f in t.plan_files()})[1]
    flt = {"event_ts_day": day}
    path, recursive = iceberg_stream_source_path(t, flt)
    assert recursive

    out = str(tmp_path / "bf_out")
    ckpt = str(tmp_path / "bf_ckpt")
    sink = ParquetLedgerSink(out, event_ts_col="window_start")
    src = read_clip_stream(spark, path, max_files_per_trigger=1,
                           recursive=True)
    agg = tumbling_agg(src, "event_ts", "speaker_id", "dur_ms", "10 minutes")

    q = (agg.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .foreachBatch(sink.foreach_batch()).start())
    # Bounded wait: under a loaded box batch cadence stretches. A query
    # that races ahead and finishes is a no-op restart; one that dies on
    # its own IS the kill this test performs — a persistent failure
    # resurfaces loudly in the restarted query's processAllAvailable.
    deadline = _time.time() + 120
    while len(sink.committed_batches()) < 2 and q.isActive:
        if _time.time() > deadline:
            break
        _time.sleep(0.2)
    q.stop()  # kill mid-backfill

    q2 = (agg.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch(sink.foreach_batch()).start())
    q2.processAllAvailable()
    q2.stop()

    audit = sink.audit()
    assert audit["unique_batch_ids"] and audit["consistent"]

    # resumed pruned backfill == batch aggregate over that day's rows,
    # restricted to watermark-closed windows (the stream never closes
    # windows past the final watermark)
    import pandas as pd
    from pyspark.sql import functions as F

    day_rows = t.read(spark, partition_filter=flt)
    want_full = tumbling_agg(
        day_rows.withColumn("event_ts", F.col("event_ts").cast("timestamp")),
        "event_ts", "speaker_id", "dur_ms", "10 minutes")
    final_wm = day_rows.agg(F.max("event_ts")).first()[0]
    got = sink.read_committed(spark).orderBy(
        "window_start", "speaker_id").toPandas().reset_index(drop=True)
    want = (want_full
            .filter(F.col("window_end")
                    <= F.lit(final_wm) - F.expr("INTERVAL 60 seconds"))
            .orderBy("window_start", "speaker_id")
            .toPandas().reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want,
                                  check_dtype=False)
