"""A11 stub-connector contract: the Cassandra source's option-passing
path, covered without the connector jar.

``read_cassandra`` is the engine's binding for the reference's only
input (``Query.java:146-153``); the jar is absent in this environment,
so the live read stays env-gated. What CAN be pinned is the contract:
every connection option the reference configures on its Cluster builder
(``Query.java:127-143``) must arrive at the DataSource-V2 boundary under
the public spark-cassandra-connector names. The fake below is a real
PySpark Python DataSource registered under a test format name — the read
goes through the full ``spark.read.format(...).options(...).load()``
machinery (plan, schema, partition, executor read), and the reader EMITS
the options it received as rows, so the assertion covers what the
connector would actually see, not what we think we sent."""

from __future__ import annotations

import pytest

from cql_xmlpipe_spark.sources.fake_cassandra import FakeCassandraSource
from cql_xmlpipe_spark.sources.registry import cassandra_options, read_cassandra


@pytest.fixture()
def fake_cassandra(spark):
    spark.dataSource.register(FakeCassandraSource)
    return spark


def test_cassandra_option_passthrough_default(fake_cassandra):
    """Credential-less branch (the reference's ``user == null`` Cluster):
    contact points, port, read timeout, fetch size, and reconnection
    policy all arrive; NO auth options leak through."""
    df = read_cassandra(
        fake_cassandra, "factsearch", "facts", fmt="fake_cassandra"
    )
    got = {r["opt_key"]: r["opt_value"] for r in df.collect()}
    # Python data sources lower-case option keys (CaseInsensitiveDict);
    # compare case-insensitively, as the connector itself does.
    want = {
        k.lower(): v for k, v in cassandra_options("factsearch", "facts").items()
    }
    assert {k: got[k] for k in want} == want
    assert want["keyspace"] == "factsearch" and want["table"] == "facts"
    assert want["spark.cassandra.connection.host"] == "127.0.0.1"
    assert want["spark.cassandra.connection.port"] == "9042"
    assert want["spark.cassandra.read.timeoutms"] == "40000"  # Query.java:133
    assert want["spark.cassandra.input.fetch.sizeinrows"] == "1000"  # :31,152
    assert want["spark.cassandra.connection.reconnectiondelayms.min"] == "500"
    assert want["spark.cassandra.connection.reconnectiondelayms.max"] == "300000"
    assert not any("auth" in k for k in got)


def test_cassandra_option_passthrough_credentials(fake_cassandra):
    """Credentialed branch (``Query.java:128-136``): username/password
    plus a multi-node contact list and non-default port/timeouts."""
    df = read_cassandra(
        fake_cassandra,
        "ks",
        "tbl",
        fmt="fake_cassandra",
        host="10.0.0.1,10.0.0.2",
        port=9043,
        username="scott",
        password="tiger",
        read_timeout_ms=20000,
        fetch_size=500,
    )
    got = {r["opt_key"]: r["opt_value"] for r in df.collect()}
    assert got["spark.cassandra.connection.host"] == "10.0.0.1,10.0.0.2"
    assert got["spark.cassandra.connection.port"] == "9043"
    assert got["spark.cassandra.auth.username"] == "scott"
    assert got["spark.cassandra.auth.password"] == "tiger"
    assert got["spark.cassandra.read.timeoutms"] == "20000"
    assert got["spark.cassandra.input.fetch.sizeinrows"] == "500"


def test_cassandra_unknown_format_raises_original_error(fake_cassandra):
    """A non-default fmt that fails must surface the real error, not the
    jar-guidance RuntimeError (that message is for the live connector)."""
    with pytest.raises(Exception) as ei:
        read_cassandra(fake_cassandra, "ks", "tbl", fmt="no_such_source")
    assert "spark-cassandra-connector" not in str(ei.value)


def _connector_jar_present(spark) -> bool:
    """True when the real spark-cassandra-connector is on the session's
    classpath (vendored via spark.jars / --packages)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "com.datastax.spark.connector.datasource.CassandraCatalog"
        )
        return True
    except Exception:
        return False


def test_cassandra_jar_absence_gate_reason(fake_cassandra):
    """The env boundary itself, asserted live (r12 verdict task 4): with
    the DEFAULT live format and no connector jar, read_cassandra raises
    the actionable jar-guidance RuntimeError instead of a raw JVM
    ClassNotFound. Skipped (inverted) in an environment that vendors the
    jar — there the live path is exercised instead."""
    if _connector_jar_present(fake_cassandra):
        pytest.skip("connector jar present: the live-read test covers this")
    with pytest.raises(RuntimeError) as ei:
        read_cassandra(fake_cassandra, "ks", "tbl")
    msg = str(ei.value)
    assert "spark-cassandra-connector" in msg and "--packages" in msg


def test_cassandra_live_read_when_jar_vendored(fake_cassandra):
    """Env-gated LIVE integration path: only runs where the connector jar
    is vendored (never in the baked container — no network, no jar); the
    skip reason names the boundary so the gate is auditable either way."""
    if not _connector_jar_present(fake_cassandra):
        pytest.skip(
            "spark-cassandra-connector jar not on the classpath (baked "
            "container has no jar and no network; vendor it via "
            "spark.jars/--packages to run the live read path)"
        )
    df = read_cassandra(
        fake_cassandra, "ks", "tbl", host="127.0.0.1"
    )  # pragma: no cover - jar-present environments only
    assert df.schema is not None
