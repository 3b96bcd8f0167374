"""End-to-end batch lineage (engine/lineage.py): checkpoint offset log ⨝
sink commits, and tail offsets resolved back to input data files."""
import os

from engine.iceberg import IcebergTable, IcebergSink
from engine.lineage import (
    batch_lineage,
    lineage_df,
    read_offset_log,
    tail_offset_range_files,
)
from engine.sink import ParquetLedgerSink
from engine.streams import read_clip_stream_tail, write_clips_iceberg
from engine.windows import tumbling_agg


def _run(spark, tmp_path, sink, name, n_files=4):
    t = write_clips_iceberg(str(tmp_path / f"topic_{name}"), 100 * n_files,
                            n_files=n_files, seed=9, files_per_snapshot=2)
    ckpt = str(tmp_path / f"ckpt_{name}")
    src = read_clip_stream_tail(
        spark, t, max_files_per_trigger=1,
        progress_dir=str(tmp_path / f"prog_{name}"))
    agg = tumbling_agg(src, "event_ts", "speaker_id", "dur_ms", "10 minutes")
    q = (agg.writeStream.outputMode("append")
         .option("checkpointLocation", ckpt)
         .foreachBatch(sink.foreach_batch()).start())
    q.processAllAvailable()
    q.stop()
    return t, ckpt


def test_lineage_ledger_sink(spark, tmp_path):
    sink = ParquetLedgerSink(str(tmp_path / "out"),
                             event_ts_col="window_start")
    # 12 files at 1/trigger → ≥12 planned batches, crossing batch id 10:
    # a lexicographic offset-dir listing would misorder the log here
    t, ckpt = _run(spark, tmp_path, sink, "ledger", n_files=12)

    log = read_offset_log(ckpt)
    assert [b["batch_id"] for b in log] == list(range(len(log)))
    assert all(b["completed"] for b in log)
    assert len(log) >= 12
    assert all(len(b["end_offsets"]) == 1 for b in log)

    lin = batch_lineage(ckpt, sink)
    assert lin[0]["start_offsets"] is None
    for prev, cur in zip(lin, lin[1:]):
        assert cur["start_offsets"] == prev["end_offsets"]
    # sink facts joined: committed rows account for every output row
    total = sum(r["sink"]["row_count"] for r in lin if r["sink"])
    assert total == sink.read_committed(spark).count()
    # watermark is monotone over batches
    wms = [r["watermark_ms"] for r in lin]
    assert wms == sorted(wms)

    # each batch's offset range resolves to exactly its input files, and
    # the ranges partition the append log (disjoint, complete, ordered);
    # precomputed log → one metadata walk for all batches
    applog = t.append_log()
    all_files = [f.file_path for _, fs in applog for f in fs]
    seen = []
    for r in lin:
        start = r["start_offsets"][0] if r["start_offsets"] else None
        files = tail_offset_range_files(t, start, r["end_offsets"][0],
                                        log=applog)
        seen.extend(f.file_path for f in files)
    assert seen == all_files
    assert "head_truncated" not in lin[0]  # batch 0 retained

    df = lineage_df(spark, ckpt, sink)
    assert df.count() == len(lin)
    assert df.filter("completed AND sink IS NOT NULL").count() >= 4


def test_lineage_iceberg_sink(spark, tmp_path):
    """Full provenance chain across TWO Iceberg tables: input snapshot
    slice → micro-batch → output snapshot id."""
    sink = IcebergSink(str(tmp_path / "isink"))
    t, ckpt = _run(spark, tmp_path, sink, "ice")
    lin = batch_lineage(ckpt, sink)
    out_t = sink.table()
    snap_by_batch = {r["batch_id"]: r["sink"]["snapshot_id"]
                     for r in lin if r["sink"]}
    # every committed output snapshot is a real snapshot of the out table
    real = {s["snapshot-id"] for s in out_t.snapshots()}
    assert set(snap_by_batch.values()) <= real
    # and the input side of the same rows is a tail offset in t's log
    last = [r for r in lin if r["sink"]][-1]
    assert last["end_offsets"][0]["snap"] in {
        sid for sid, _ in t.append_log()}
