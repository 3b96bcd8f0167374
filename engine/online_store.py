"""SQL online store: the sandbox's executed JDBC boundary.

Reference: ``base/engine/VectorServer.java:368-382`` opens a real MySQL /
RonDB connection (``DriverManager.getConnection`` :380) and serves vectors
through prepared statements — ``WHERE pk = ?`` point lookups (:112-157) and
a batch variant that rewrites the statement with an ``IN ((k1),(k2),...)``
row-value tuple list (:201-268, tuple hack :234-236). Complex features come
back as Avro bytes and are decoded client-side AFTER the fetch (:403-420).

No MySQL driver or server exists in this sandbox, so the online table lives
in stdlib ``sqlite3`` — a real SQL engine with real prepared statements and
row-value ``IN`` support, which is exactly the boundary being modeled: the
engine writes the resolved online table through SQL, and lookups never
touch Spark. ``VectorServer`` keeps its driver-dict snapshot and Spark
paths; tests assert the three are row-identical.

Type mapping: long/bool → INTEGER, double → REAL, string → TEXT,
binary → BLOB, timestamp → TEXT (ISO-8601, documented lossy-free to µs).
Array/struct columns must either be Avro-encoded bytes (the reference's
complex-feature wire form) or excluded.
"""

from __future__ import annotations

import sqlite3
from typing import Iterable

import pandas as pd

__all__ = ["SqlOnlineStore"]

_AFFINITY = {
    "int": "INTEGER", "bigint": "INTEGER", "smallint": "INTEGER",
    "tinyint": "INTEGER", "boolean": "INTEGER",
    "double": "REAL", "float": "REAL",
    "string": "TEXT", "timestamp": "TEXT", "timestamp_ntz": "TEXT",
    "date": "TEXT", "binary": "BLOB",
}


def _py(v):
    """Normalize a collected Spark value for sqlite binding."""
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, pd.Timestamp):
        return v.isoformat(sep=" ")
    if isinstance(v, bytearray):
        return bytes(v)
    import datetime

    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) else v.isoformat()
    return v


class SqlOnlineStore:
    """One sqlite database holding one table per online feature group."""

    def __init__(self, db_path: str = ":memory:"):
        self._con = sqlite3.connect(db_path)
        self._meta: dict[str, list[str]] = {}  # table -> pk cols

    def close(self) -> None:
        self._con.close()

    # -- write side ----------------------------------------------------------
    def write_group(self, name: str, df, primary_key: list[str]) -> int:
        """(Re)materialize one feature group's online table.

        ``df`` is a Spark DataFrame — the already-resolved online view (one
        row per key after upsert resolution). Rows stream in through
        parameterized ``INSERT OR REPLACE`` statements with the primary key
        declared on the table, so a re-write upserts by key exactly like the
        reference's online-store writer. Returns the row count written.
        """
        cols, decls = [], []
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t not in _AFFINITY:
                raise ValueError(
                    f"column {f.name!r} has type {t!r}; the SQL online store "
                    "supports scalar types (encode arrays/structs as Avro "
                    "bytes — the reference's complex-feature wire form)"
                )
            cols.append(f.name)
            decls.append(f'"{f.name}" {_AFFINITY[t]}')
        missing = [k for k in primary_key if k not in cols]
        if missing:
            raise ValueError(f"primary key columns missing from frame: {missing}")
        pk = ", ".join(f'"{k}"' for k in primary_key)
        cur = self._con.cursor()
        cur.execute(f'DROP TABLE IF EXISTS "{name}"')
        cur.execute(
            f'CREATE TABLE "{name}" ({", ".join(decls)}, PRIMARY KEY ({pk}))'
        )
        placeholders = ", ".join("?" for _ in cols)
        stmt = (
            f'INSERT OR REPLACE INTO "{name}" '
            f'({", ".join(chr(34) + c + chr(34) for c in cols)}) '
            f"VALUES ({placeholders})"
        )
        n = 0
        # toLocalIterator keeps driver memory bounded by one partition —
        # online tables are key-cardinality-sized by contract, but do not
        # assume they fit in one driver list
        batch: list[tuple] = []
        for row in df.toLocalIterator():
            batch.append(tuple(_py(row[c]) for c in cols))
            if len(batch) >= 10_000:
                cur.executemany(stmt, batch)
                n += len(batch)
                batch = []
        if batch:
            cur.executemany(stmt, batch)
            n += len(batch)
        self._con.commit()
        self._meta[name] = list(primary_key)
        return n

    # -- read side -------------------------------------------------------------
    def _columns(self, name: str) -> list[str]:
        cur = self._con.execute(f'SELECT * FROM "{name}" LIMIT 0')
        return [d[0] for d in cur.description]

    def get(self, name: str, entry: dict) -> dict | None:
        """Point lookup via a prepared ``WHERE pk = ? [AND ...]`` statement
        (``VectorServer.java:112-157``)."""
        pks = self._meta[name]
        where = " AND ".join(f'"{k}" = ?' for k in pks)
        cur = self._con.execute(
            f'SELECT * FROM "{name}" WHERE {where}',
            tuple(_py(entry[k]) for k in pks),
        )
        row = cur.fetchone()
        if row is None:
            return None
        return dict(zip([d[0] for d in cur.description], row))

    def get_batch(self, name: str, entries: Iterable[dict]) -> list[dict]:
        """Batch lookup via the ``IN ((k1),(k2),...)`` row-value tuple list
        (``VectorServer.java:201-268``; tuple hack :234-236)."""
        pks = self._meta[name]
        entries = list(entries)
        if not entries:
            return []
        lhs = "(" + ", ".join(f'"{k}"' for k in pks) + ")"
        tup = "(" + ", ".join("?" for _ in pks) + ")"
        # SQLite caps bound variables per statement (999 before 3.32,
        # 32766 after); chunk the tuple list the way the reference rewrites
        # oversized batch statements so any batch size works on any build
        per_chunk = max(1, 900 // len(pks))
        out: list[dict] = []
        for i in range(0, len(entries), per_chunk):
            chunk = entries[i:i + per_chunk]
            in_list = ", ".join(tup for _ in chunk)
            params = tuple(_py(e[k]) for e in chunk for k in pks)
            cur = self._con.execute(
                f'SELECT * FROM "{name}" WHERE {lhs} IN (VALUES {in_list})',
                params,
            )
            names = [d[0] for d in cur.description]
            out.extend(dict(zip(names, r)) for r in cur.fetchall())
        return out
