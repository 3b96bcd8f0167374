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


class SecurityProtocol:
    """Kafka security protocols (``base/SecurityProtocol.java``)."""

    PLAINTEXT = "PLAINTEXT"
    SASL_PLAINTEXT = "SASL_PLAINTEXT"
    SASL_SSL = "SASL_SSL"
    SSL = "SSL"
    ALL = (PLAINTEXT, SASL_PLAINTEXT, SASL_SSL, SSL)


class SslEndpointIdentificationAlgorithm:
    """``base/SslEndpointIdentificationAlgorithm.java``: HTTPS or the empty
    string (the enum's EMPTY serializes as ``""`` — its toString override)."""

    HTTPS = "HTTPS"
    EMPTY = ""
    ALL = (HTTPS, EMPTY)

    @classmethod
    def from_string(cls, value: str) -> str:
        v = value.upper()
        if v in cls.ALL:
            return v
        raise ConnectorError(
            "Invalid ssl endpoint identification algorithm provided"
        )


@dataclass
class KafkaConnector:
    """Kafka connector (``StorageConnector.java:197-302``): bootstrap servers
    + the reference's full SSL/SASL surface; streaming read validates format
    and subscription.

    ``spark_options()`` mirrors ``sparkOptions()`` (:239-268) key-for-key,
    emitting the exact ``base/util/Constants.java:72-80`` option names:
    ``kafka.bootstrap.servers``, ``kafka.security.protocol``,
    ``kafka.ssl.truststore.location/.password``,
    ``kafka.ssl.keystore.location/.password``, ``kafka.ssl.key.password``,
    ``kafka.ssl.endpoint.identification.algorithm`` (which — matching the
    reference comment — may be the empty string), plus free-form extra
    ``options`` merged last. The live broker path stays sandbox-gated; the
    option map is what a real ``readStream.format("kafka")`` consumes."""

    bootstrap_servers: str
    security: dict = field(default_factory=dict)  # legacy free-form map
    security_protocol: str | None = None
    ssl_truststore_location: str | None = None
    ssl_truststore_password: str | None = None
    ssl_keystore_location: str | None = None
    ssl_keystore_password: str | None = None
    ssl_key_password: str | None = None
    ssl_endpoint_identification_algorithm: str | None = None
    extra_options: dict = field(default_factory=dict)

    VALID_FORMATS = ("avro", "json")

    def __post_init__(self) -> None:
        if (
            self.security_protocol is not None
            and self.security_protocol not in SecurityProtocol.ALL
        ):
            raise ConnectorError(
                f"invalid security protocol {self.security_protocol!r}; "
                f"one of {SecurityProtocol.ALL}"
            )
        if self.ssl_endpoint_identification_algorithm is not None:
            self.ssl_endpoint_identification_algorithm = (
                SslEndpointIdentificationAlgorithm.from_string(
                    self.ssl_endpoint_identification_algorithm
                )
            )

    def spark_options(self) -> dict[str, str]:
        """The reference's ``sparkOptions()`` twin — exact Constants keys,
        same null/empty guards, ssl algorithm allowed to be ``""``."""
        opts = {"kafka.bootstrap.servers": self.bootstrap_servers}
        if self.security_protocol:
            opts["kafka.security.protocol"] = self.security_protocol
        if self.ssl_truststore_location:
            opts["kafka.ssl.truststore.location"] = self.ssl_truststore_location
        if self.ssl_truststore_password:
            opts["kafka.ssl.truststore.password"] = self.ssl_truststore_password
        if self.ssl_keystore_location:
            opts["kafka.ssl.keystore.location"] = self.ssl_keystore_location
        if self.ssl_keystore_password:
            opts["kafka.ssl.keystore.password"] = self.ssl_keystore_password
        if self.ssl_key_password:
            opts["kafka.ssl.key.password"] = self.ssl_key_password
        # can be empty string (StorageConnector.java:259-263)
        if self.ssl_endpoint_identification_algorithm is not None:
            opts["kafka.ssl.endpoint.identification.algorithm"] = (
                self.ssl_endpoint_identification_algorithm
            )
        opts.update({f"kafka.{k}": v for k, v in self.security.items()})
        opts.update(self.extra_options)
        return opts

    def options(self, **kw) -> dict[str, str]:
        return {**self.spark_options(), **kw}

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
