"""Micro-bench: snapshot vs Spark-job point lookup latency (VERDICT r2 #4).

The reference serves vectors via JDBC prepared statements against RonDB in
milliseconds (VectorServer.java:112-157); a Spark job per point lookup is
seconds. The driver-side snapshot dict is the in-sandbox analogue of that
online-store boundary. This script measures both paths on the same
VectorServer and prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.serving import VectorServer  # noqa: E402
from engine.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_LOOKUPS = int(os.environ.get("N_LOOKUPS", "50"))


def main():
    spark = get_spark("bench-point-lookup", cores=8, shuffle_partitions=8)
    cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
    vs = VectorServer([("customer", cust, ["c_custkey"])])
    keys = list(range(1, N_LOOKUPS + 1))

    # warm both paths once (snapshot build / plan compile excluded from both)
    vs.get_feature_vector({"c_custkey": 1})
    vs.get_feature_vector({"c_custkey": 1}, use_snapshot=False)

    t0 = time.perf_counter()
    for k in keys:
        vs.get_feature_vector({"c_custkey": k})
    snap_ms = (time.perf_counter() - t0) / N_LOOKUPS * 1000

    t0 = time.perf_counter()
    for k in keys:
        vs.get_feature_vector({"c_custkey": k}, use_snapshot=False)
    spark_ms = (time.perf_counter() - t0) / N_LOOKUPS * 1000

    # parity spot-check while we're here
    for k in (1, 7, 23):
        a = vs.get_feature_vector({"c_custkey": k})
        b = vs.get_feature_vector({"c_custkey": k}, use_snapshot=False)
        assert a == b, f"path divergence at key {k}"

    print(json.dumps({
        "metric": "point_lookup_latency_ms",
        "snapshot_ms": round(snap_ms, 4),
        "spark_job_ms": round(spark_ms, 2),
        "speedup": round(spark_ms / snap_ms, 1),
        "n_lookups": N_LOOKUPS,
        "parity": True,
    }))


if __name__ == "__main__":
    main()
