"""Hot-key skew soak (T1 evidence, r2 VERDICT #7).

24k-clip stream with a manufactured hot key (~50% of rows forced onto one
speaker), 10-minute tumbling aggregate over dur_ms, local[16], four paths:

1. built-in window() groupBy                 (engine.windows.tumbling_agg)
2. salted two-phase chained aggregation      (engine.skew.salted_window_agg_stream)
3. custom applyInPandasWithState, unsalted   (engine.state.stateful_window_agg)
4. custom store SALTED (n_salts) + foreachBatch merge_window_partials  [r3]

All four write through the exactly-once ledger sink; row counts must agree.
Prints one JSON line. Run with nothing else active on the box.
"""
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_CLIPS = int(os.environ.get("N_CLIPS", "96000"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def hotify(df):
    # deterministic 50% hot key: half of all clip_ids map to speaker 1
    return df.withColumn(
        "speaker_id",
        F.when(F.pmod(F.xxhash64("clip_id"), F.lit(2)) == 0, F.lit(1)).otherwise(
            F.col("speaker_id")
        ),
    )


def run_path(spark, clips_dir, work, name, build):
    from engine.sink import ParquetLedgerSink
    from engine.streams import read_clip_stream

    out_dir = os.path.join(work, f"sink_{name}")
    ckpt = os.path.join(work, f"ckpt_{name}")
    sink = ParquetLedgerSink(out_dir, event_ts_col="window_start")
    src = hotify(read_clip_stream(spark, clips_dir, max_files_per_trigger=2))
    agg, fe = build(src, sink)
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .foreachBatch(fe)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    elapsed = time.perf_counter() - t0
    rows = sink.audit()["ledger_rows"]
    ok = sink.audit()["consistent"]
    return {"elapsed_sec": round(elapsed, 1),
            "clips_per_sec": round(N_CLIPS / elapsed, 0),
            "out_rows": rows, "audit": ok}


def main():
    from engine.session import get_spark
    from engine.skew import salted_window_agg_stream
    from engine.state import merge_window_partials, stateful_window_agg
    from engine.streams import write_clips_stream_dir
    from engine.windows import tumbling_agg

    spark = get_spark("bench-hotkey", cores=CPUS, shuffle_partitions=CPUS)
    work = tempfile.mkdtemp(prefix="hotkey_")
    clips_dir = os.path.join(work, "clips")
    write_clips_stream_dir(clips_dir, N_CLIPS, n_files=12, seed=11)
    # warm the JVM/Python workers so path order does not bias the comparison

    # warmup: tiny throwaway streams compile the plans/JVM paths so the
    # first measured path is not biased by session warmup
    from engine.state import stateful_window_agg as _swa
    from engine.streams import read_clip_stream as _rcs
    from engine.sink import ParquetLedgerSink as _PLS
    warm_dir = os.path.join(work, "warm_clips")
    write_clips_stream_dir(warm_dir, 2000, n_files=2, seed=1)
    for wname, wagg in (
        ("w1", lambda s_: tumbling_agg(s_, "event_ts", "speaker_id", "dur_ms", "10 minutes")),
        ("w2", lambda s_: _swa(s_, "event_ts", "speaker_id", "dur_ms", "10 minutes", n_buckets=4)),
    ):
        wq = (
            wagg(_rcs(spark, warm_dir, max_files_per_trigger=2))
            .writeStream.outputMode("append")
            .option("checkpointLocation", os.path.join(work, f"wc_{wname}"))
            .foreachBatch(_PLS(os.path.join(work, f"ws_{wname}")).foreach_batch())
            .start()
        )
        wq.processAllAvailable()
        wq.stop()

    results = {}
    results["builtin"] = run_path(
        spark, clips_dir, work, "builtin",
        lambda src, sink: (
            tumbling_agg(src, "event_ts", "speaker_id", "dur_ms", "10 minutes"),
            sink.foreach_batch(),
        ),
    )
    results["salted_builtin"] = run_path(
        spark, clips_dir, work, "salted_builtin",
        lambda src, sink: (
            salted_window_agg_stream(
                src, "event_ts", "speaker_id", "dur_ms", "10 minutes", n_salts=16
            ),
            sink.foreach_batch(),
        ),
    )
    results["custom_unsalted"] = run_path(
        spark, clips_dir, work, "custom_unsalted",
        lambda src, sink: (
            stateful_window_agg(
                src, "event_ts", "speaker_id", "dur_ms", "10 minutes",
                n_buckets=CPUS,
            ),
            sink.foreach_batch(),
        ),
    )

    def build_custom_salted(src, sink):
        partials = stateful_window_agg(
            src, "event_ts", "speaker_id", "dur_ms", "10 minutes",
            n_buckets=max(2, CPUS // 2), n_salts=8,
        )

        def fe(batch_df, batch_id):
            merged = merge_window_partials(batch_df, "speaker_id", "10m")
            sink.write_batch(merged, batch_id)

        return partials, fe

    results["custom_salted"] = run_path(
        spark, clips_dir, work, "custom_salted", build_custom_salted
    )

    counts = {k: v["out_rows"] for k, v in results.items()}
    ratio = (results["custom_salted"]["elapsed_sec"]
             / results["salted_builtin"]["elapsed_sec"])
    print(json.dumps({
        "metric": "hotkey_soak", "n_clips": N_CLIPS, "cpus": CPUS,
        "paths": results, "rows_agree": len(set(counts.values())) == 1,
        "custom_salted_vs_salted_builtin": round(ratio, 2),
    }))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
