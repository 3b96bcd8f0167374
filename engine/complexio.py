"""Complex-feature wire codec (F6): struct/array/map columns as bytes.

The reference stores complex features Avro-binary-encoded in the online store
(``FeatureGroupUtils.getEncodedAvroSchema``, ``base/engine/FeatureGroupUtils
.java:191-200``) and lazily decodes them at serving time
(``VectorServer.java:403-420``).  Spark's ``from_avro``/``to_avro`` live in
the external ``spark-avro`` module, which is not on this runtime's classpath,
so:

- :func:`to_avro_col` / :func:`from_avro_col` use the real Avro functions when
  the jar is present (``--packages org.apache.spark:spark-avro_2.13:<ver>``),
  raising a clear error otherwise;
- :func:`encode_complex` / :func:`decode_complex` are the always-available
  byte codec with the same shape (complex → bytes at rest, lazily decoded),
  built on ``to_json``/``from_json`` — JVM-side, codegen-friendly, no Python.

The audio payload itself never goes through this path — it has its own
vectorized PCM codec (engine.audio).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _avro_functions():
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        return from_avro, to_avro
    except ImportError as e:  # pragma: no cover
        raise ImportError("pyspark.sql.avro not importable") from e


def to_avro_col(col: Column | str, json_schema: str | None = None) -> Column:
    """Avro-binary encode (requires the spark-avro jar on the classpath)."""
    _, to_avro = _avro_functions()
    c = F.col(col) if isinstance(col, str) else col
    return to_avro(c, json_schema) if json_schema else to_avro(c)


def from_avro_col(col: Column | str, json_schema: str) -> Column:
    """Avro-binary decode (requires the spark-avro jar on the classpath)."""
    from_avro, _ = _avro_functions()
    c = F.col(col) if isinstance(col, str) else col
    return from_avro(c, json_schema)


def avro_available(spark) -> bool:
    """True when to_avro can actually execute (jar present, not just the
    Python wrapper importable)."""
    try:
        df = spark.range(1).select(to_avro_col(F.struct(F.lit(1).alias("a"))).alias("b"))
        df.collect()
        return True
    except Exception:
        return False


def encode_complex(df: DataFrame, cols: list[str], suffix: str = "_bytes") -> DataFrame:
    """Serialize complex columns to bytes for the online store (F6 fallback
    codec: JSON wire format). Each ``c`` becomes ``c + suffix``: binary."""
    out = df
    for c in cols:
        out = out.withColumn(c + suffix, F.to_json(F.col(c)).cast("binary")).drop(c)
    return out


def decode_complex(
    df: DataFrame, col: str, schema_ddl: str, out_col: str | None = None
) -> DataFrame:
    """Lazily decode a bytes column back to its complex type at serving time
    (``VectorServer.java:403-420`` analogue). ``schema_ddl`` is the column's
    DDL type, e.g. ``'array<double>'`` or ``'struct<a:int,b:string>'``."""
    out_col = out_col or col.removesuffix("_bytes")
    return df.withColumn(
        out_col, F.from_json(F.col(col).cast("string"), schema_ddl)
    ).drop(col)
