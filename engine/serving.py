"""Online point / batch feature-vector lookup.

Reference: ``base/engine/VectorServer.java`` — JDBC prepared statements
``WHERE pk = ?`` per feature group (:112-157), a batch variant that rewrites
the statement with an ``IN ((k1),(k2),...)`` tuple list (:201-268, tuple hack
:234-236), Avro-decode of complex/bytes columns (:403-420), and stitching of
multi-feature-group vectors in prepared-statement (TreeMap) order (:339-366).
Missing primary-key entries raise (:137-139, :422-427).

Spark expression: the "online store" is just the latest committed feature
table; a lookup is a broadcast-hash semi-join of a small key DataFrame against
it (point lookups and batch lookups share one plan). On a real deployment the
online table would live in an external KV/JDBC store — the class keeps that
boundary behind ``source_df`` so a JDBC reader can be swapped in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LookupError_(KeyError):
    """Mirrors VectorServer's FeatureStoreException on unknown serving keys."""


def _norm_key(v):
    """Normalize a primary-key value for dict lookup (numpy scalar → python)."""
    return v.item() if hasattr(v, "item") else v


def _resolve_df(df_or_factory) -> DataFrame:
    """A feature group's online table may be a DataFrame or a zero-arg
    factory (re-resolved per call so new store commits become visible)."""
    return df_or_factory() if callable(df_or_factory) else df_or_factory


class VectorServer:
    def __init__(
        self,
        feature_groups: list[tuple[str, DataFrame, list[str]]],
        transformations: dict | None = None,
        ts_col: str | None = None,
        complex_features: dict | None = None,
        snapshot_token_fn=None,
    ):
        """``feature_groups``: ordered [(name, online_df, primary_key_cols)].
        Order is preserved when stitching vectors, mirroring the TreeMap
        iteration order of ``VectorServer.java:339-366``. The ``online_df``
        slot also accepts a ZERO-ARG CALLABLE returning the DataFrame — a
        store-backed server must pass a factory, because a resolved
        ``FeatureStore.read`` plan bakes in the commit list visible at build
        time; the factory is re-invoked on every lookup/snapshot-rebuild so
        new commits actually become visible.

        ``transformations``: feature name → ``TransformationFunction``
        (``base/TransformationFunctionAttached.java``) applied to served
        columns — this is the Python serving path the reference's Java client
        refuses to handle itself (``VectorServer.java:293-315``).

        ``ts_col``: event/window timestamp used to order rows *within* the
        newest commit when a backfill batch carries several rows per key
        (latest timestamp wins before the ``batch_id`` tie-break).

        ``complex_features``: feature name → per-feature Avro union schema
        (JSON string or dict, as ``FeatureGroup.feature_avro_schema``
        returns). Columns listed here are stored as Avro-binary bytes in the
        online table and are lazily decoded back to their typed value at
        lookup time — the ``VectorServer.java:403-420`` deserializer. Decode
        runs BEFORE transformations, so a transformation attached to a
        complex feature sees the typed value.

        ``snapshot_token_fn``: zero-arg callable returning a hashable
        staleness token for the online tables (e.g. the store ledger's
        latest commit id / mtime). Point lookups answer from a driver-side
        snapshot dict (the sandbox analogue of the reference's online KV
        store — ``VectorServer.java:112-157`` hits RonDB via JDBC in
        milliseconds, and a Spark job per point lookup is the wrong tool);
        the snapshot rebuilds whenever the token changes. Without a token
        fn the snapshot is built once and kept until
        :meth:`invalidate_snapshots`.
        """
        self.feature_groups = feature_groups
        self.transformations = {
            k.lower(): v for k, v in (transformations or {}).items()
        }
        self.ts_col = ts_col
        self.complex_features = {
            k.lower(): v for k, v in (complex_features or {}).items()
        }
        self.snapshot_token_fn = snapshot_token_fn
        self._snapshots: dict = {}  # name -> (token, {pk_tuple: row_dict})
        pk_sets = {tuple(pks) for _, _, pks in feature_groups}
        if len(pk_sets) > 1:
            raise ValueError(
                "all feature groups must share the same primary keys for "
                f"vector stitching; got {sorted(pk_sets)}"
            )

    def _latest_order(self, df: DataFrame) -> list:
        """Newest-row ordering: event/window ts first (when present), then
        commit order — mirrors jobs.cmd_serve's tie-break."""
        order = []
        if self.ts_col and self.ts_col in df.columns:
            order.append(F.desc_nulls_last(self.ts_col))
        if "batch_id" in df.columns:
            order.append(F.desc("batch_id"))
        return order


    def _check_keys(self, entry: dict, pks: list[str]) -> None:
        missing = [k for k in pks if k not in entry]
        if missing:
            raise LookupError_(
                f"Provided primary key map doesn't contain required keys: {missing}"
            )

    def get_feature_vector(self, entry: dict, use_snapshot: bool = True) -> dict:
        """Single lookup: primary-key map → stitched feature dict.

        Raises if any feature group has no row for the key
        (``VectorServer.java:137-139``).

        Default path is the driver-side snapshot (millisecond dict lookup,
        mirroring the reference's online-store JDBC boundary); pass
        ``use_snapshot=False`` to run the lookup as a Spark job — the two
        are row-identical (pytest-asserted parity) because the snapshot is
        built by collecting the SAME decode+transform plan.
        """
        if not use_snapshot:
            return self._get_feature_vector_spark(entry)
        out: dict = {}
        for name, df, pks in self.feature_groups:
            self._check_keys(entry, pks)
            snap, ambiguous = self._snapshot(name, df, pks)
            key = tuple(_norm_key(entry[k]) for k in pks)
            if key in ambiguous:
                raise LookupError_(
                    f"key {entry} has multiple rows in group '{name}' and no "
                    "batch_id/ts_col to order by — reduce the online table to "
                    "one row per key (latest window/commit) before serving"
                )
            row = snap.get(key)
            if row is None:
                raise LookupError_(f"No feature vector for {entry} in group '{name}'")
            for k, v in row.items():
                out.setdefault(k, v)
        return out

    def _get_feature_vector_spark(self, entry: dict) -> dict:
        """The Spark-job point lookup (semantics twin of the snapshot path)."""
        out: dict = {}
        for name, df, pks in self.feature_groups:
            df = _resolve_df(df)
            self._check_keys(entry, pks)
            cond = None
            for k in pks:
                c = F.col(k) == F.lit(entry[k])
                cond = c if cond is None else (cond & c)
            matched = df.filter(cond)
            order = self._latest_order(df)
            if order:
                # multi-version table: newest event/window row of the newest
                # commit wins (not an arbitrary row within the newest batch)
                matched = matched.orderBy(*order)
            # complex decode then transformations run inside the SAME plan
            # the batch path uses (typed columns — a null feature value
            # transforms to null instead of crashing local schema inference)
            matched = self._apply_transforms_df(self._decode_complex_df(matched))
            rows = matched.limit(2).collect()
            if not rows:
                raise LookupError_(f"No feature vector for {entry} in group '{name}'")
            if len(rows) > 1 and not order:
                raise LookupError_(
                    f"key {entry} has multiple rows in group '{name}' and no "
                    "batch_id/ts_col to order by — reduce the online table to "
                    "one row per key (latest window/commit) before serving"
                )
            row = rows[0].asDict()
            for k, v in row.items():
                out.setdefault(k, v)
        return out

    # -- executed SQL online-store boundary (VectorServer.java:368-382) -----
    def init_sql_store(self, store) -> None:
        """Materialize every group's resolved online table into a SQL online
        store (:class:`engine.online_store.SqlOnlineStore` — the executed
        JDBC boundary; the reference opens a real MySQL/RonDB connection at
        ``VectorServer.java:368-382``). Rows are written oldest→newest so
        the store's ``INSERT OR REPLACE`` primary-key upsert leaves exactly
        the newest row per key — the same resolution the snapshot applies
        driver-side. Complex features stay RAW Avro bytes in the store and
        decode client-side at lookup time (:403-420); transformations are
        engine-side Column functions by design, so they are applied before
        the write (and may not target a complex feature in this mode)."""
        clash = set(self.transformations) & set(self.complex_features)
        if clash:
            raise ValueError(
                f"transformations on complex features {sorted(clash)} are "
                "not supported on the SQL online-store path — decode "
                "happens at lookup time, after transforms would have run"
            )
        self._sql_store = store
        for name, df, pks in self.feature_groups:
            df = _resolve_df(df)
            resolved = self._apply_transforms_df(df)
            order = []
            if self.ts_col and self.ts_col in df.columns:
                order.append(F.asc_nulls_first(self.ts_col))
            if "batch_id" in df.columns:
                order.append(F.asc("batch_id"))
            if order:
                resolved = resolved.orderBy(*order)
            else:
                # no order columns: INSERT OR REPLACE would let an arbitrary
                # partition-order-dependent row win — raise the same
                # ambiguity error the snapshot/Spark paths raise instead of
                # breaking row-identical parity nondeterministically
                dup = (resolved.groupBy(*pks).count()
                       .filter(F.col("count") > 1).limit(1).collect())
                if dup:
                    key = {k: dup[0][k] for k in pks}
                    raise LookupError_(
                        f"key {key} has multiple rows in group '{name}' and "
                        "no batch_id/ts_col to order by — reduce the online "
                        "table to one row per key (latest window/commit) "
                        "before serving"
                    )
            store.write_group(name, resolved, pks)

    def _decode_complex_row(self, row: dict) -> dict:
        from engine.complexio import avro_decode_datum

        for c, schema in self.complex_features.items():
            if c in row and row[c] is not None:
                row[c] = avro_decode_datum(bytes(row[c]), schema)
        return row

    def get_feature_vector_sql(self, entry: dict) -> dict:
        """Point lookup through the SQL online store: one prepared
        ``WHERE pk = ?`` statement per group, client-side Avro decode of
        complex features — the reference's serving path executed end to
        end. Row-identical to the snapshot and Spark paths
        (pytest-asserted parity)."""
        if getattr(self, "_sql_store", None) is None:
            raise RuntimeError("call init_sql_store(store) first")
        out: dict = {}
        for name, _, pks in self.feature_groups:
            self._check_keys(entry, pks)
            row = self._sql_store.get(name, entry)
            if row is None:
                raise LookupError_(
                    f"No feature vector for {entry} in group '{name}'"
                )
            for k, v in self._decode_complex_row(row).items():
                out.setdefault(k, v)
        return out

    def get_feature_vectors_sql(self, entries: list[dict]) -> list[dict]:
        """Batch lookup through the SQL online store: the ``IN
        ((k1),(k2),...)`` row-value tuple statement (:201-268), stitched
        per key across groups in feature-group order."""
        if getattr(self, "_sql_store", None) is None:
            raise RuntimeError("call init_sql_store(store) first")
        if not entries:
            raise LookupError_("empty key batch")
        stitched: dict[tuple, dict] = {}
        for name, _, pks in self.feature_groups:
            for e in entries:
                self._check_keys(e, pks)
            found: set[tuple] = set()
            for row in self._sql_store.get_batch(name, entries):
                key = tuple(_norm_key(row[k]) for k in pks)
                found.add(key)
                dst = stitched.setdefault(key, {})
                for k, v in self._decode_complex_row(row).items():
                    dst.setdefault(k, v)
            # a key with no row in THIS group raises, like the point path
            # (and the reference, which raises on missing PK entries) —
            # silently dropping it would desync the output positions from
            # `entries` and return partial vectors
            missing = [
                e for e in entries
                if tuple(_norm_key(e[k]) for k in pks) not in found
            ]
            if missing:
                raise LookupError_(
                    f"No feature vector for {len(missing)} key(s) in group "
                    f"'{name}': {missing[:5]}"
                )
        return [stitched[tuple(_norm_key(e[k]) for k in pks)] for e in entries]

    # -- driver-side snapshot (the in-sandbox "online store") ---------------
    def invalidate_snapshots(self) -> None:
        self._snapshots.clear()

    def _snapshot(self, name: str, df: DataFrame, pks: list[str]):
        """(mapping, ambiguous_keys) for one group; rebuilt when the
        staleness token changes. Built by COLLECTING the same decode +
        transform plan the Spark paths run, so values are identical by
        construction; newest-row resolution happens driver-side with the
        same (ts desc nulls-last, batch_id desc) order."""
        token = self.snapshot_token_fn() if self.snapshot_token_fn else None
        cached = self._snapshots.get(name)
        if cached is not None and cached[0] == token:
            return cached[1], cached[2]
        # resolve the factory only on an actual rebuild — a fresh read here
        # is what makes commits landed after construction visible
        df = _resolve_df(df)
        resolved = self._apply_transforms_df(self._decode_complex_df(df))
        rows = [r.asDict() for r in resolved.collect()]
        order = []
        if self.ts_col and self.ts_col in df.columns:
            order.append(self.ts_col)
        if "batch_id" in df.columns:
            order.append("batch_id")
        # stable multi-key descending sort, nulls last (desc_nulls_last)
        for col in reversed(order):
            rows.sort(
                key=lambda r: (r[col] is not None,
                               r[col] if r[col] is not None else 0),
                reverse=True,
            )
        mapping: dict = {}
        counts: dict = {}
        for r in rows:
            key = tuple(_norm_key(r[k]) for k in pks)
            counts[key] = counts.get(key, 0) + 1
            if key not in mapping:
                mapping[key] = r
        ambiguous = (
            set() if order else {k for k, c in counts.items() if c > 1}
        )
        self._snapshots[name] = (token, mapping, ambiguous)
        return mapping, ambiguous

    def get_feature_vectors(self, spark: SparkSession, entries: list[dict]) -> DataFrame:
        """Batch lookup: the ``IN``-tuple path (:201-268) as a broadcast join.

        Returns one row per requested entry per feature group hit; callers can
        assert completeness with :meth:`check_complete`.
        """
        if not entries:
            raise LookupError_("empty key batch")
        out: DataFrame | None = None
        for name, df, pks in self.feature_groups:
            df = _resolve_df(df)
            for e in entries:
                self._check_keys(e, pks)
            keys_df = spark.createDataFrame(
                [tuple(e[k] for k in pks) for e in entries], pks
            ).dropDuplicates(pks)
            part = df.join(F.broadcast(keys_df), on=pks, how="inner")
            part = self._apply_transforms_df(self._decode_complex_df(part))
            if out is not None:
                # disambiguate non-key columns colliding across groups
                # (per-group prefix, as the reference's join prefixing does)
                clash = (set(out.columns) & set(part.columns)) - set(pks)
                for c in clash:
                    part = part.withColumnRenamed(c, f"{name}_{c}")
            out = part if out is None else out.join(part, on=pks, how="outer")
        return out

    def _apply_transforms_df(self, df: DataFrame) -> DataFrame:
        for c, tf in self.transformations.items():
            if c in df.columns:
                df = df.withColumn(c, tf(F.col(c)))
        return df

    def _decode_complex_df(self, df: DataFrame) -> DataFrame:
        """Lazily decode Avro-binary complex feature columns to their typed
        values (``VectorServer.java:403-420``); runs before transforms so a
        transformation attached to a complex feature sees the typed value."""
        if not self.complex_features:
            return df
        from engine.complexio import decode_feature_avro_udf

        for c, schema in self.complex_features.items():
            if c in df.columns:
                df = df.withColumn(c, decode_feature_avro_udf(schema)(F.col(c)))
        return df

    def check_complete(self, spark: SparkSession, entries: list[dict]) -> None:
        """Raise when any requested key is missing from any group (batch
        analogue of the single-lookup miss error)."""
        for name, df, pks in self.feature_groups:
            df = _resolve_df(df)
            keys_df = spark.createDataFrame(
                [tuple(e[k] for k in pks) for e in entries], pks
            ).dropDuplicates(pks)
            n_miss = keys_df.join(df, on=pks, how="left_anti").count()
            if n_miss:
                raise LookupError_(
                    f"{n_miss} requested key(s) have no feature vector in group '{name}'"
                )
