"""Storage connectors (S6): thin, validated option-dict builders.

The reference's ``flink/StorageConnector.java:59-304`` models HopsFS, S3,
JDBC, and Kafka connectors whose job is to (a) hold credentials/locations and
(b) produce correctly-spelled reader options; execution is the engine's.  Our
equivalents build ``spark.read`` / ``spark.readStream`` invocations.

Validation mirrors the reference:
- Kafka ``read_stream`` accepts only message formats avro/json and exactly one
  of ``subscribe`` | ``subscribePattern`` (``StorageConnector.java:283-301``).
- JDBC carries url/user/password/driver options (``:163-195``).
- Path connectors (HopsFS → any hadoop-compatible FS, S3 → s3a://) prefix
  their scheme and surface hadoop conf entries for credentials.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class ConnectorError(ValueError):
    pass


@dataclass
class FsConnector:
    """Path-based connector (HopsFS analogue: any Hadoop-compatible FS)."""

    base_path: str

    def path(self, sub: str = "") -> str:
        return f"{self.base_path.rstrip('/')}/{sub.lstrip('/')}" if sub else self.base_path

    def read(self, spark: SparkSession, data_format: str, sub_path: str = "",
             options: dict | None = None) -> DataFrame:
        return (
            spark.read.format(data_format)
            .options(**(options or {}))
            .load(self.path(sub_path))
        )


@dataclass
class S3Connector(FsConnector):
    """S3 connector: s3a:// paths + credential hadoop-conf entries
    (``StorageConnector.java`` S3 section)."""

    access_key: str | None = None
    secret_key: str | None = None
    session_token: str | None = None
    endpoint: str | None = None

    def __post_init__(self) -> None:
        if not self.base_path.startswith("s3a://"):
            self.base_path = "s3a://" + self.base_path.lstrip("/")

    def hadoop_conf(self) -> dict[str, str]:
        conf = {}
        if self.access_key:
            conf["fs.s3a.access.key"] = self.access_key
        if self.secret_key:
            conf["fs.s3a.secret.key"] = self.secret_key
        if self.session_token:
            conf["fs.s3a.session.token"] = self.session_token
            conf["fs.s3a.aws.credentials.provider"] = (
                "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
            )
        if self.endpoint:
            conf["fs.s3a.endpoint"] = self.endpoint
        return conf

    def apply(self, spark: SparkSession) -> None:
        for k, v in self.hadoop_conf().items():
            spark.sparkContext._jsc.hadoopConfiguration().set(k, v)


@dataclass
class JdbcConnector:
    """JDBC connector (``StorageConnector.java:163-195``): connection options
    plus per-read dbtable/query."""

    url: str
    user: str | None = None
    password: str | None = None
    driver: str | None = None
    extra: dict = field(default_factory=dict)

    def options(self, **per_read) -> dict[str, str]:
        opts = {"url": self.url, **self.extra, **per_read}
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.driver:
            opts["driver"] = self.driver
        if "dbtable" not in opts and "query" not in opts:
            raise ConnectorError("JDBC read requires dbtable or query")
        return opts

    def read(self, spark: SparkSession, **per_read) -> DataFrame:
        return spark.read.format("jdbc").options(**self.options(**per_read)).load()


@dataclass
class KafkaConnector:
    """Kafka connector (``StorageConnector.java:197-302``): bootstrap servers
    + security options; streaming read validates format and subscription."""

    bootstrap_servers: str
    security: dict = field(default_factory=dict)  # e.g. SSL/SASL option map

    VALID_FORMATS = ("avro", "json")

    def options(self, **kw) -> dict[str, str]:
        return {"kafka.bootstrap.servers": self.bootstrap_servers,
                **{f"kafka.{k}": v for k, v in self.security.items()}, **kw}

    def read_stream(
        self,
        spark: SparkSession,
        message_format: str,
        topic: str | None = None,
        topic_pattern: str | None = None,
        starting_offsets: str = "earliest",
        include_metadata: bool = False,
    ) -> DataFrame:
        """Streaming subscribe (validation mirrors ``:283-301``)."""
        if message_format.lower() not in self.VALID_FORMATS:
            raise ConnectorError(
                f"Can only read JSON and AVRO from Kafka, got {message_format!r}"
            )
        if (topic is None) == (topic_pattern is None):
            raise ConnectorError("exactly one of topic / topic_pattern required")
        sub = {"subscribe": topic} if topic else {"subscribePattern": topic_pattern}
        reader = spark.readStream.format("kafka").options(
            **self.options(**sub, startingOffsets=starting_offsets)
        )
        df = reader.load()
        if not include_metadata:
            df = df.select("key", "value", "topic", "timestamp")
        return df
