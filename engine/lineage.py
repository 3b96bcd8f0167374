"""End-to-end batch lineage: join Spark's checkpoint offset log with the
exactly-once sink's commit records, so every OUTPUT commit maps to the
exact INPUT offset range that produced it.

The reference's feature-group commits expose per-commit provenance
(``base/FeatureGroupCommit.java``: commit id, row counts, time bounds;
validated reads pin to a commit).  Structured Streaming already persists
the matching input-side facts — ``<checkpoint>/offsets/<batchId>`` holds
the watermark and each source's end offset, ``<checkpoint>/commits/``
marks completion — but they live in the engine's WAL, not next to the
output.  This module reads that WAL (public on-disk format: a ``v1``
header line, one metadata JSON line, then one offset line per source) and
stitches:

    input offsets (start, end] per source
      → batch id → watermark at plan time
      → sink commit (ledger row_count / partition metrics, or the Iceberg
        snapshot id carrying ``streaming-batch-id``)

For a snapshot-tail source (engine/tail.py) the offsets are themselves
``{snap, pos}`` coordinates in the INPUT table's append log, so the chain
"input Iceberg snapshot slice → micro-batch → output Iceberg snapshot" is
complete and provable from durable metadata alone — nothing is sampled
from memory, so it works after the query (or the driver) is gone.

Scale shape: O(#batches) small-file reads on the driver; no Spark job.
"""
from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _read_wal_entry(path: str) -> tuple[dict, list]:
    """One ``offsets/<batchId>`` file → (metadata, [per-source offset]).
    Offsets parse as JSON when possible (our tail source, Kafka), else
    stay raw strings (file-source logOffset is JSON too, but be safe)."""
    with open(path) as fh:
        lines = [ln for ln in fh.read().splitlines() if ln]
    if not lines or lines[0] != "v1":
        raise ValueError(f"unrecognized offset log format in {path!r}")
    meta = json.loads(lines[1]) if len(lines) > 1 else {}
    offsets = []
    for ln in lines[2:]:
        try:
            offsets.append(json.loads(ln))
        except ValueError:
            offsets.append(ln)
    return meta, offsets


def read_offset_log(checkpoint_dir: str) -> list[dict]:
    """The planned-batch log, one dict per batch id (ascending):
    ``{batch_id, batch_timestamp_ms, watermark_ms, end_offsets,
    completed}`` — ``completed`` from the commits/ dir (a planned but
    uncommitted trailing batch is the replay-on-restart candidate)."""
    odir = os.path.join(checkpoint_dir, "offsets")
    if not os.path.isdir(odir):
        raise FileNotFoundError(f"no offset log under {checkpoint_dir!r}")
    cdir = os.path.join(checkpoint_dir, "commits")
    committed = {
        int(n) for n in os.listdir(cdir)
        if n.isdigit()
    } if os.path.isdir(cdir) else set()
    out = []
    # numeric sort: Spark names offset files without zero padding, so a
    # lexicographic listing misorders past batch 9
    for n in sorted((n for n in os.listdir(odir) if n.isdigit()), key=int):
        meta, offsets = _read_wal_entry(os.path.join(odir, n))
        out.append({
            "batch_id": int(n),
            "batch_timestamp_ms": meta.get("batchTimestampMs"),
            "watermark_ms": meta.get("batchWatermarkMs"),
            "end_offsets": offsets,
            "completed": int(n) in committed,
        })
    return out


def batch_lineage(checkpoint_dir: str, sink=None) -> list[dict]:
    """Per-batch provenance records: each batch's (start, end] offset
    range per source (start = previous batch's end; None for the first),
    the watermark it planned under, and — when ``sink`` is given — the
    output side: a ``ParquetLedgerSink`` contributes ``row_count`` and
    per-partition metrics from its ledger, an ``IcebergSink`` the output
    ``snapshot_id`` whose summary carries the batch id."""
    log = read_offset_log(checkpoint_dir)
    sink_info: dict[int, dict] = {}
    if sink is not None:
        if hasattr(sink, "committed_batches"):      # ParquetLedgerSink
            for rec in sink.committed_batches():
                sink_info[rec.batch_id] = {
                    "row_count": rec.row_count,
                    "partitions": rec.partitions,
                    "mode": rec.mode,
                }
        elif hasattr(sink, "table"):                 # IcebergSink
            t = sink.table()
            for s in t.snapshots():
                bid = s["summary"].get(sink.BATCH_KEY)
                if bid is not None:
                    sink_info[int(bid)] = {
                        "snapshot_id": s["snapshot-id"],
                        "row_count": int(
                            s["summary"].get("added-records", 0)),
                    }
        else:
            raise TypeError(
                f"unsupported sink {type(sink).__name__}: need "
                "committed_batches() (ledger) or table() (Iceberg)")
    out = []
    prev = None
    for i, b in enumerate(log):
        rec = {
            "batch_id": b["batch_id"],
            "start_offsets": prev,
            "end_offsets": b["end_offsets"],
            "watermark_ms": b["watermark_ms"],
            "batch_timestamp_ms": b["batch_timestamp_ms"],
            "completed": b["completed"],
        }
        if i == 0 and b["batch_id"] != 0:
            # Spark purges offset entries past minBatchesToRetain: the
            # retained head's true start lives in a deleted file — do NOT
            # read start=None as "log begin" here
            rec["head_truncated"] = True
        if sink is not None:
            rec["sink"] = sink_info.get(b["batch_id"])
        out.append(rec)
        prev = b["end_offsets"]
    return out


def lineage_df(spark: SparkSession, checkpoint_dir: str,
               sink=None) -> DataFrame:
    """DataFrame twin (offsets/sink facts JSON-encoded for a stable
    schema): one row per planned batch."""
    rows = [
        (r["batch_id"],
         json.dumps(r["start_offsets"])
         if r["start_offsets"] is not None else None,
         json.dumps(r["end_offsets"]), r["watermark_ms"],
         r["batch_timestamp_ms"], r["completed"],
         json.dumps(r["sink"])
         if sink is not None and r.get("sink") is not None else None)
        for r in batch_lineage(checkpoint_dir, sink)
    ]
    return spark.createDataFrame(
        rows,
        "batch_id long, start_offsets string, end_offsets string, "
        "watermark_ms long, batch_timestamp_ms long, completed boolean, "
        "sink string")


def tail_offset_range_files(table, start: dict | None, end: dict,
                            partition_filter: dict | None = None,
                            log: list | None = None) -> list:
    """Resolve a tail-source batch's (start, end] offset range back to the
    exact input DATA FILES it delivered — closing the loop: output commit
    → batch → input files, all from durable metadata.  ``start``/``end``
    are tail offsets (``{"snap", "pos"}``); start None means the log's
    beginning, which is only correct for batch 0 of an untruncated offset
    log (see ``head_truncated`` in :func:`batch_lineage`).

    ``partition_filter`` MUST equal the filter the stream ran with —
    offset positions index the reader's FILTERED per-snapshot lists, so a
    mismatched filter resolves to the wrong files.  Pass ``log`` (one
    ``table.append_log(partition_filter=...)`` result) when resolving
    many batches to avoid re-walking the table metadata per call."""
    from engine.tail import offset_index

    if log is None:
        log = table.append_log(partition_filter=partition_filter)
    flat = [f for _, files in log for f in files]
    i0 = offset_index(log, start) if start else 0
    i1 = offset_index(log, end)
    return flat[i0:i1]
