"""Feature / FeatureGroup metadata model.

Re-expresses the reference's data model (SURVEY.md §1) natively on Spark:

- ``Feature``      ≈ ``base/Feature.java:40-136`` — a named, typed column with
  primary/partition/event-time flags and an optional default value.
- ``FeatureGroup`` ≈ ``flink/StreamFeatureGroup.java:52-124`` +
  ``base/metadata/FeatureGroupBase.java:51-119`` — a named, versioned table of
  Features with primary keys, partition keys and an event-time column; the
  physical table name is mangled ``{name}_{version}``
  (``base/engine/FeatureGroupUtils.java:57-64``).

Identifier normalization follows the reference exactly: all feature and key
names are lowercased at the API boundary (``base/Feature.java:143-145``,
``flink/engine/FlinkEngine.java:97-103``).

Schema evolution rule preserved: appends only; dropping a feature is a breaking
change (``base/metadata/FeatureGroupBase.java:258-279``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Reference type-name → Spark type. The reference's offline types are
# Hive-flavored (base/util/Constants.java:30); complex types map to Spark's
# native complex types instead of Avro-bytes blobs (we only fall back to
# binary for opaque media payloads, mirroring the bytes-encoded complex
# features of VectorServer.java:403-420).
_TYPE_MAP: dict[str, T.DataType] = {
    "string": T.StringType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
    "bytes": T.BinaryType(),
}


def spark_type(name: str | T.DataType) -> T.DataType:
    if isinstance(name, T.DataType):
        return name
    key = name.strip().lower()
    if key in _TYPE_MAP:
        return _TYPE_MAP[key]
    # array<...>, map<...>, struct<...> via Spark's DDL parser
    return T._parse_datatype_string(name)


class SchemaError(ValueError):
    """Raised on key/schema validation failures.

    Mirrors FeatureStoreException raised by
    ``base/engine/FeatureGroupUtils.verifyAttributeKeyNames``
    (``base/engine/FeatureGroupUtils.java:210-242``).
    """


@dataclass
class Feature:
    """A named, typed column with feature-store flags.

    Reference: ``base/Feature.java:40-136`` (name lowercasing at :143-145).
    """

    name: str
    type: str | T.DataType = "string"
    primary: bool = False
    partition: bool = False
    precombine: bool = False  # hudiPrecombineKey analogue
    default_value: object = None
    description: str | None = None
    #: True when added after creation via ``append_features``
    #: (``base/metadata/FeatureGroupBase.java:265-277``): batches committed
    #: before the append read as null for this column, and inserts may omit it
    #: (backfilled with null / ``default_value``).
    appended: bool = False

    def __post_init__(self) -> None:
        self.name = self.name.strip().lower()

    @property
    def dtype(self) -> T.DataType:
        return spark_type(self.type)

    def to_struct_field(self) -> T.StructField:
        meta = {
            "primary": self.primary,
            "partition": self.partition,
            "precombine": self.precombine,
        }
        if self.description:
            meta["description"] = self.description
        # Avro union[null, T] fields in the reference are all nullable
        # (transaction.avsc:7-16); keep nullable=True uniformly.
        return T.StructField(self.name, self.dtype, True, metadata=meta)

    # Comparison predicates (base/Feature.java:147-213) live on the DSL side —
    # see engine.query.FeatureRef.


def sanitize_feature_names(df: DataFrame) -> DataFrame:
    """Lowercase all column names (``FlinkEngine.sanitizeFeatureNames:97-103``)."""
    return df.toDF(*[c.lower() for c in df.columns])


@dataclass
class FeatureGroup:
    """A named + versioned feature table.

    Reference: ``flink/StreamFeatureGroup.java:52-124``. ``insert_stream``
    plumbing lives in :mod:`engine.sink`; query construction entry points
    (``select*``) return :class:`engine.query.Query` objects.
    """

    name: str
    version: int = 1
    features: list[Feature] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    partition_key: list[str] = field(default_factory=list)
    event_time: str | None = None
    description: str | None = None
    online_enabled: bool = True
    # Physical location (set by the store / sink)
    path: str | None = None

    def __post_init__(self) -> None:
        self.name = self.name.strip().lower()
        self.primary_key = [k.strip().lower() for k in self.primary_key]
        self.partition_key = [k.strip().lower() for k in self.partition_key]
        if self.event_time:
            self.event_time = self.event_time.strip().lower()
        self._validate_keys()

    # -- metadata ---------------------------------------------------------
    @property
    def table_name(self) -> str:
        """``{name}_{version}`` (``FeatureGroupUtils.getFgName``, :57-64)."""
        return f"{self.name}_{self.version}"

    @property
    def feature_names(self) -> list[str]:
        return [f.name for f in self.features]

    def spark_schema(self) -> T.StructType:
        return T.StructType([f.to_struct_field() for f in self.features])

    def _validate_keys(self) -> None:
        names = set(self.feature_names)
        if not names:
            return  # schema may be inferred later from a DataFrame
        for label, keys in (
            ("primary", self.primary_key),
            ("partition", self.partition_key),
            ("event-time", [self.event_time] if self.event_time else []),
        ):
            for k in keys:
                if k not in names:
                    raise SchemaError(
                        f"Provided {label} key(s) {k} doesn't exist in feature dataframe"
                    )

    # -- schema interop ---------------------------------------------------
    @classmethod
    def from_dataframe(
        cls,
        name: str,
        df: DataFrame,
        version: int = 1,
        primary_key: list[str] | None = None,
        partition_key: list[str] | None = None,
        event_time: str | None = None,
        **kw,
    ) -> "FeatureGroup":
        """Infer Features from a DataFrame schema, lowercased.

        Analogue of ``FlinkEngine.parseFeatureGroupSchema``
        (``flink/engine/FlinkEngine.java:69-78``).
        """
        pk = set(k.lower() for k in (primary_key or []))
        part = set(k.lower() for k in (partition_key or []))
        feats = [
            Feature(
                f.name.lower(),
                f.dataType,
                primary=f.name.lower() in pk,
                partition=f.name.lower() in part,
            )
            for f in df.schema.fields
        ]
        return cls(
            name=name,
            version=version,
            features=feats,
            primary_key=sorted(pk),
            partition_key=sorted(part),
            event_time=event_time,
            **kw,
        )

    @property
    def appended_features(self) -> list[str]:
        return [f.name for f in self.features if f.appended]

    def append_features(self, feats: list[Feature]) -> None:
        """Append-only schema evolution
        (``base/metadata/FeatureGroupBase.java:265-277``; SURVEY §1.2:
        dropping a feature is a breaking change — appends only).

        New features must not collide with existing names or be declared as
        keys. They are marked ``appended`` so old committed batches read as
        null for them and old-shaped inserts keep working (null backfill via
        :meth:`conform`). Persisting the updated metadata is the owning
        store's job (``FeatureStore.append_features``).
        """
        existing = set(self.feature_names)
        for f in feats:
            if f.name in existing:
                raise SchemaError(
                    f"Feature '{f.name}' already exists in '{self.table_name}' "
                    "— schema evolution is append-only"
                )
            if f.primary or f.partition:
                raise SchemaError(
                    f"appended feature '{f.name}' cannot be a primary/partition "
                    "key (keys are fixed at creation)"
                )
            f.appended = True
            self.features.append(f)
            existing.add(f.name)

    def verify_schema(self, df: DataFrame) -> None:
        """Check an incoming DataFrame structurally matches this group.

        Analogue of the schema verification in
        ``FeatureGroupEngine.insertStream`` → ``verifySchemaCompatibility``.
        Extra columns are an error; missing columns are an error — except
        features added later via :meth:`append_features`, which may be absent
        (null-backfilled on insert); type mismatches are an error.
        Nullability is not checked (everything is nullable, §1.3).
        """
        incoming = {f.name.lower(): f.dataType for f in df.schema.fields}
        declared = {f.name: f.dtype for f in self.features}
        optional = set(self.appended_features)
        missing = sorted(set(declared) - set(incoming) - optional)
        extra = sorted(set(incoming) - set(declared))
        if missing or extra:
            raise SchemaError(
                f"Features are not compatible with feature group '{self.table_name}': "
                f"missing={missing} unexpected={extra}"
            )
        for name, dtype in declared.items():
            if name in incoming and incoming[name].simpleString() != dtype.simpleString():
                raise SchemaError(
                    f"Feature '{name}' type mismatch: expected {dtype.simpleString()}, "
                    f"got {incoming[name].simpleString()}"
                )

    def conform(self, df: DataFrame) -> DataFrame:
        """Null-backfill absent appended features (or their declared default)
        and project to declared column order, so every committed batch has the
        full current schema regardless of which era shaped the input."""
        from pyspark.sql import functions as F

        have = {c.lower() for c in df.columns}
        for f in self.features:
            if f.name not in have:
                fill = (
                    F.lit(f.default_value) if f.default_value is not None else F.lit(None)
                )
                df = df.withColumn(f.name, fill.cast(f.dtype))
        return df.select(*self.feature_names)

    # -- physical read -----------------------------------------------------
    def attach(self, df: DataFrame) -> "FeatureGroup":
        """Bind an in-memory DataFrame as this group's source (tests, temp views)."""
        self._df = df
        return self

    def read(self, spark=None) -> DataFrame:
        """Offline read (S8): attached DataFrame, else the owning store's
        ledgered table (exactly the committed rows, with ``_commit_ts`` for
        time travel), else parquet at ``path``."""
        df = getattr(self, "_df", None)
        if df is not None:
            return df
        store = getattr(self, "_store", None)
        if store is not None:
            if spark is None:
                raise ValueError("spark session required to read from the store")
            return store.read(spark, self)
        if self.path:
            if spark is None:
                raise ValueError("spark session required to read from path")
            return spark.read.parquet(self.path)
        raise ValueError(f"feature group '{self.name}' has no attached data or path")

    # -- query entry points (wired in engine.query to avoid a cycle) ------
    def select_all(self):
        from engine.query import Query

        return Query.from_feature_group(self)

    def select(self, names: list[str]):
        from engine.query import Query

        return Query.from_feature_group(self, [n.lower() for n in names])

    def select_except(self, names: list[str]):
        drop = {n.lower() for n in names}
        from engine.query import Query

        keep = [f for f in self.feature_names if f not in drop]
        return Query.from_feature_group(self, keep)

    def as_of(self, wallclock_time, exclude_until=None):
        """``StreamFeatureGroup.asOf`` (``flink/StreamFeatureGroup.java:
        153-172``): time-travel query directly off the group."""
        return self.select_all().as_of(wallclock_time, exclude_until)

    # -- avro schema surface (StreamFeatureGroup.java:186-213) -------------
    def complex_features(self) -> list[str]:
        """Features whose type is complex (serialized as bytes online —
        ``getComplexFeatures``, :192-196)."""
        return [
            f.name
            for f in self.features
            if isinstance(f.dtype, (T.ArrayType, T.MapType, T.StructType))
        ]

    def avro_schema(self) -> str:
        """``getAvroSchema`` (:186-190): the group's Avro record schema as a
        JSON string (union[null, T] per feature, §1.3)."""
        import json

        from engine.complexio import feature_group_avro_schema

        return json.dumps(feature_group_avro_schema(self), sort_keys=True)

    def encoded_avro_schema(self) -> str:
        """``getEncodedAvroSchema`` (:204-208): like :meth:`avro_schema` but
        complex features are wire-encoded as bytes
        (``FeatureGroupUtils.getEncodedAvroSchema``, :191-200)."""
        import json

        from engine.complexio import feature_group_avro_schema

        complex_names = set(self.complex_features())
        doc = feature_group_avro_schema(
            FeatureGroup(
                name=self.name, version=self.version,
                features=[
                    Feature(f.name, "binary" if f.name in complex_names else f.type,
                            primary=f.primary, partition=f.partition)
                    for f in self.features
                ],
                primary_key=self.primary_key, partition_key=self.partition_key,
                event_time=self.event_time,
            )
        )
        return json.dumps(doc, sort_keys=True)

    def feature_avro_schema(self, name: str) -> str:
        """``getFeatureAvroSchema`` (:198-202): one feature's union schema."""
        import json

        from engine.complexio import feature_group_avro_schema

        f = self.get_feature(name)
        doc = feature_group_avro_schema(
            FeatureGroup(name=self.name, version=self.version, features=[f])
        )
        return json.dumps(doc["fields"][0]["type"], sort_keys=True)

    def get_feature(self, name: str) -> Feature:
        name = name.lower()
        for f in self.features:
            if f.name == name:
                return f
        raise SchemaError(f"Feature '{name}' not found in feature group '{self.name}'")
