"""Source registry: table name → DataFrame.

The reference's only source is a paged CQL scan (``Query.java:31,151-157``,
fetch size 1000 ≙ constant-memory pipelined extraction). In Spark the
equivalent is a partition-parallel columnar scan; paging falls out of the
source's partitioning. The registry abstracts the physical source so the
same engine code runs over the parquet testdata today and a
``spark-cassandra-connector`` catalog later (the connector jar is not baked
into this environment, so that path is declared but gated).

Scale note: parquet scans get predicate pushdown + column pruning from
Catalyst for free; at 100 TB the same scans are driven by partition pruning
on the table layout — nothing here materializes or collects.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: tables the driver provides at /root/testdata/sf*/ (TESTDATA.md)
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Load one named table as a DataFrame (lazy — just a scan node)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    # events.parquet carries parquet TIMESTAMP(NANOS), which vanilla Spark
    # refuses to read (PARQUET_TYPE_ILLEGAL). nanosAsLong is a runtime SQL
    # conf, so set it here instead of relying on the session factory — this
    # keeps every query runnable on ANY caller-supplied SparkSession (the
    # correctness driver builds its own, without our session.py confs).
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover - conf locked on exotic sessions
        pass
    df = spark.read.parquet(path)
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as long (see
    # session conf nanosAsLong); convert to a microsecond timestamp, which
    # is exactly what DuckDB's ns->us truncation yields for the oracle.
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, T.LongType):
            # integer `div`, NOT `/`: double division loses µs precision on
            # ~1.7e18 ns epoch values (> 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, T.TimestampNTZType):
            # TIMESTAMP(MICROS) loads as TIMESTAMP_NTZ, which Spark refuses
            # to cast to numeric types (breaking every epoch-seconds
            # expression downstream); sessions here pin UTC, so the cast to
            # instant-typed TimestampType is value-identical
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every testdata table as a temp view so ``spark.sql`` serves
    the reference's delegated query surface (SURVEY §2B) directly."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


#: Default DataSource-V2 format of the live connector (jar not baked into
#: this environment; tests inject a registered Python DataSource instead).
CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def cassandra_options(
    keyspace: str,
    table: str,
    host: str = "127.0.0.1",
    port: int = 9042,
    username: str | None = None,
    password: str | None = None,
    read_timeout_ms: int = 40000,
    fetch_size: int = 1000,
) -> dict[str, str]:
    """The reference's connection surface (``Query.java:127-143``) mapped
    onto the public spark-cassandra-connector option namespace:

    * ``addContactPoints``/``withPort`` → ``connection.host``/``.port``
      (host accepts the same comma-separated multi-node list);
    * ``withCredentials`` → ``auth.username``/``auth.password``, emitted
      only when a username is given — the reference builds a
      credential-less Cluster in that branch, not empty credentials;
    * ``SocketOptions.setReadTimeoutMillis(40000)`` → ``read.timeoutMS``;
    * ``setFetchSize(batchSize)`` (``Query.java:31,152`` — the paging
      that bounds driver memory) → ``input.fetch.sizeInRows``; in Spark
      the real constant-memory property is partition-parallel scanning,
      but the per-request page size still caps coordinator round-trips;
    * ``ExponentialReconnectionPolicy(500, 300000)`` →
      ``connection.reconnectionDelayMS.min``/``.max``. (The reference's
      ``DowngradingConsistencyRetryPolicy`` has no connector equivalent —
      consistency is a read conf, ``input.consistency.level``, left at
      the connector default LOCAL_ONE which is where the downgrading
      policy bottoms out anyway.)

    Split from :func:`read_cassandra` so the option contract is testable
    without the jar.
    """
    opts = {
        "keyspace": keyspace,
        "table": table,
        "spark.cassandra.connection.host": host,
        "spark.cassandra.connection.port": str(port),
        "spark.cassandra.read.timeoutMS": str(read_timeout_ms),
        "spark.cassandra.input.fetch.sizeInRows": str(fetch_size),
        "spark.cassandra.connection.reconnectionDelayMS.min": "500",
        "spark.cassandra.connection.reconnectionDelayMS.max": "300000",
    }
    if username is not None:
        opts["spark.cassandra.auth.username"] = username
        opts["spark.cassandra.auth.password"] = password if password is not None else ""
    return opts


def read_cassandra(
    spark: SparkSession,
    keyspace: str,
    table: str,
    fmt: str = CASSANDRA_FORMAT,
    **conn_kwargs,
) -> DataFrame:
    """Cassandra source (the reference's actual input, ``Query.java:146-153``).

    The live path requires the spark-cassandra-connector jar on the
    classpath; not baked into this environment, so it raises with guidance
    instead of failing deep inside the JVM. The option-passing contract is
    covered without the jar by ``tests/test_sources.py``, which registers
    an in-process Python DataSource (DataSource-V2) as ``fmt`` and asserts
    every ``cassandra_options`` entry arrives through ``spark.read``.
    """
    opts = cassandra_options(keyspace, table, **conn_kwargs)
    try:
        return spark.read.format(fmt).options(**opts).load()
    except Exception as exc:
        if fmt != CASSANDRA_FORMAT:
            raise
        raise RuntimeError(  # pragma: no cover - connector not in test env
            "spark-cassandra-connector is not on the classpath; add "
            "`--packages com.datastax.spark:spark-cassandra-connector_2.13:...` "
            "to spark-submit to read live Cassandra tables"
        ) from exc
