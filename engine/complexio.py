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


# ---------------------------------------------------------------------------
# Pure-Python Avro BINARY codec — wire-compatible fallback
# ---------------------------------------------------------------------------
# The reference writes online rows as Avro binary GenericRecords
# (``OnlineFeatureGroupGenericRecordWriter.java:49-73``) against a schema of
# ``union[null, T]`` fields. When the spark-avro jar is absent, the JSON
# codec above is NOT wire-compatible; this section is — it implements the
# Avro 1.x binary encoding (public spec: avro.apache.org/docs/current/
# specification) directly: zigzag varints, length-prefixed utf8/bytes,
# little-endian IEEE floats, single-block arrays/maps, union-index prefixes.
# Byte-for-byte what Java's BinaryEncoder emits for the same datum+schema.

import json as _json
import struct as _struct


def _zigzag(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_zigzag(buf: bytes, pos: int) -> tuple[int, int]:
    shift, acc = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _norm_schema(s):
    if isinstance(s, str):
        return {"type": s}
    return s


def _avro_write(value, schema, out: bytearray) -> None:
    schema = _norm_schema(schema)
    if isinstance(schema, list):  # union: index then value
        for i, branch in enumerate(schema):
            bt = _norm_schema(branch)["type"] if not isinstance(branch, list) else None
            if value is None and bt == "null":
                out += _zigzag(i)
                return
            if value is not None and bt != "null":
                out += _zigzag(i)
                _avro_write(value, branch, out)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if value else 0)
    elif t in ("int", "long"):
        out += _zigzag(int(value))
    elif t == "float":
        out += _struct.pack("<f", float(value))
    elif t == "double":
        out += _struct.pack("<d", float(value))
    elif t == "string":
        b = str(value).encode("utf-8")
        out += _zigzag(len(b)) + b
    elif t == "bytes":
        b = bytes(value)
        out += _zigzag(len(b)) + b
    elif t == "record":
        for f in schema["fields"]:
            _avro_write(value.get(f["name"]), f["type"], out)
    elif t == "array":
        items = list(value)
        if items:
            out += _zigzag(len(items))
            for it in items:
                _avro_write(it, schema["items"], out)
        out += _zigzag(0)
    elif t == "map":
        entries = dict(value)
        if entries:
            out += _zigzag(len(entries))
            for k, v in entries.items():
                kb = str(k).encode("utf-8")
                out += _zigzag(len(kb)) + kb
                _avro_write(v, schema["values"], out)
        out += _zigzag(0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def _avro_read(buf: bytes, pos: int, schema):
    schema = _norm_schema(schema)
    if isinstance(schema, list):
        idx, pos = _read_zigzag(buf, pos)
        return _avro_read(buf, pos, schema[idx])
    t = schema["type"]
    if t == "null":
        return None, pos
    if t == "boolean":
        return bool(buf[pos]), pos + 1
    if t in ("int", "long"):
        return _read_zigzag(buf, pos)
    if t == "float":
        return _struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return _struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t in ("string", "bytes"):
        n, pos = _read_zigzag(buf, pos)
        raw = buf[pos:pos + n]
        return (raw.decode("utf-8") if t == "string" else bytes(raw)), pos + n
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = _avro_read(buf, pos, f["type"])
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = _read_zigzag(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix
                _, pos = _read_zigzag(buf, pos)
                n = -n
            for _ in range(n):
                v, pos = _avro_read(buf, pos, schema["items"])
                items.append(v)
    if t == "map":
        entries = {}
        while True:
            n, pos = _read_zigzag(buf, pos)
            if n == 0:
                return entries, pos
            if n < 0:
                _, pos = _read_zigzag(buf, pos)
                n = -n
            for _ in range(n):
                klen, pos = _read_zigzag(buf, pos)
                k = buf[pos:pos + klen].decode("utf-8")
                pos += klen
                entries[k], pos = _avro_read(buf, pos, schema["values"])
    raise ValueError(f"unsupported avro type {t!r}")


def avro_encode_datum(value, schema) -> bytes:
    """Avro binary encoding of one datum (no container/file framing — the
    raw BinaryEncoder stream, exactly what the reference Kafka-produces)."""
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[")):
        schema = _json.loads(schema)
    out = bytearray()
    _avro_write(value, schema, out)
    return bytes(out)


def avro_decode_datum(buf: bytes, schema):
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[")):
        schema = _json.loads(schema)
    value, pos = _avro_read(bytes(buf), 0, schema)
    if pos != len(buf):
        raise ValueError(f"trailing {len(buf) - pos} bytes after datum")
    return value


def feature_group_avro_schema(fg) -> dict:
    """``FeatureGroupUtils.getEncodedAvroSchema`` analogue
    (``base/engine/FeatureGroupUtils.java:191-200``): a record whose fields
    are ``union[null, T]`` (every feature nullable, §1.3)."""
    _SPARK_TO_AVRO = {
        "string": "string", "int": "int", "bigint": "long", "long": "long",
        "float": "float", "double": "double", "boolean": "boolean",
        "binary": "bytes", "timestamp": "long", "timestamp_ntz": "long",
        "date": "int",
    }

    def to_avro(dt_simple: str):
        if dt_simple.startswith("array<"):
            return {"type": "array", "items": to_avro(dt_simple[6:-1])}
        if dt_simple.startswith("map<string,"):
            return {"type": "map", "values": to_avro(dt_simple[11:-1].strip())}
        if dt_simple not in _SPARK_TO_AVRO:
            raise ValueError(f"no avro mapping for spark type {dt_simple!r}")
        return _SPARK_TO_AVRO[dt_simple]

    return {
        "type": "record",
        "name": fg.table_name,
        "namespace": "pyspark_online_fs",
        "fields": [
            {"name": f.name, "type": ["null", to_avro(f.dtype.simpleString())]}
            for f in fg.features
        ],
    }


def encode_rows_avro(df: DataFrame, schema: dict | str, out_col: str = "value") -> DataFrame:
    """Encode each row as one Avro-binary record (Arrow-batched pandas UDF;
    the Python-side twin of the reference's per-row GenericDatumWriter, but
    batched). Columns must match the record schema's field names. Timestamps
    encode as epoch MICROseconds (Avro ``timestamp-micros`` convention),
    dates as epoch days."""
    import numpy as np
    import pandas as pd

    schema_obj = _json.loads(schema) if isinstance(schema, str) else schema
    names = [f["name"] for f in schema_obj["fields"]]

    def _scalarize(v):
        if isinstance(v, (list, dict, bytes, bytearray, np.ndarray)):
            return list(v) if isinstance(v, np.ndarray) else v
        if pd.isna(v):
            return None
        if isinstance(v, pd.Timestamp):
            return v.value // 1000  # ns → µs (timestamp-micros)
        import datetime as _dt

        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            return (v - _dt.date(1970, 1, 1)).days
        return v

    def op(batches):
        for pdf in batches:
            vals = [
                avro_encode_datum(
                    {k: _scalarize(v) for k, v in row.items()}, schema_obj
                )
                for row in pdf[names].to_dict("records")
            ]
            yield pd.DataFrame({out_col: vals})

    return df.select(*names).mapInPandas(op, f"{out_col} binary")


_AVRO_TO_DDL = {"string": "string", "int": "int", "long": "bigint",
                "float": "float", "double": "double",
                "boolean": "boolean", "bytes": "binary"}


def avro_type_ddl(t) -> str:
    """Spark DDL type for an Avro type (union[null, T] unwraps to T)."""
    t = t[1] if isinstance(t, list) else t  # union[null, T]
    if isinstance(t, dict) and t.get("type") == "array":
        return f"array<{avro_type_ddl(t['items'])}>"
    if isinstance(t, dict) and t.get("type") == "map":
        return f"map<string,{avro_type_ddl(t['values'])}>"
    if isinstance(t, dict):
        t = t["type"]
    return _AVRO_TO_DDL[t]


def encode_feature_avro(df: DataFrame, col: str, schema: dict | str) -> DataFrame:
    """Encode ONE complex feature column to Avro-binary bytes in place
    (per-feature wire format, ``FeatureGroupUtils.getFeatureAvroSchema``,
    ``base/engine/FeatureGroupUtils.java:198-202``). ``schema`` is the
    feature's union schema, e.g. ``["null", {"type":"array","items":
    "double"}]``. Arrow-batched; one pandas UDF, no extra shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema_obj = _json.loads(schema) if isinstance(schema, str) else schema

    def enc(s):
        def one(v):
            if v is None:
                return avro_encode_datum(None, schema_obj)
            if isinstance(v, np.ndarray):
                v = v.tolist()
            return avro_encode_datum(v, schema_obj)

        return s.map(one)

    enc_udf = F.pandas_udf(enc, T.BinaryType())
    return df.withColumn(col, enc_udf(F.col(col)))


def decode_feature_avro_udf(schema: dict | str):
    """Pandas UDF decoding a per-feature Avro-binary bytes column back to its
    typed value (``VectorServer.java:403-420`` lazy-deserialize, one column).
    """
    import pandas as pd
    from pyspark.sql import functions as F

    schema_obj = _json.loads(schema) if isinstance(schema, str) else schema
    ddl = avro_type_ddl(schema_obj)

    def dec(s):
        return s.map(
            lambda b: None if b is None else avro_decode_datum(bytes(b), schema_obj)
        )

    return F.pandas_udf(dec, ddl)


def decode_rows_avro(df: DataFrame, col: str, schema: dict | str) -> DataFrame:
    """Decode an Avro-binary bytes column back to typed columns (the
    ``VectorServer.java:403-420`` lazy-deserialize analogue)."""
    import pandas as pd

    schema_obj = _json.loads(schema) if isinstance(schema, str) else schema

    out_ddl = ", ".join(
        f"{f['name']} {avro_type_ddl(f['type'])}" for f in schema_obj["fields"]
    )
    names = [f["name"] for f in schema_obj["fields"]]

    def op(batches):
        for pdf in batches:
            recs = [avro_decode_datum(b, schema_obj) for b in pdf[col]]
            yield pd.DataFrame({n: [r.get(n) for r in recs] for n in names})

    return df.select(col).mapInPandas(op, out_ddl)
