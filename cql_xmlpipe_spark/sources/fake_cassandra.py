"""In-process DataSource-V2 stand-in for the Cassandra connector.

The live spark-cassandra-connector jar is not baked into this
environment, so ``read_cassandra``'s option-passing contract is covered
by registering THIS source under a test format name: the read then goes
through the full ``spark.read.format(...).options(...).load()``
machinery (plan, schema probe, partition planning, executor-side read),
and the reader emits the options it received as rows — the assertion
sees exactly what the real connector would see at the DataSource-V2
boundary. Lives in the package (not in tests/) because Python data
source classes are pickled by module reference and must import on
executor workers.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader


class _EchoOptionsReader(DataSourceReader):
    def __init__(self, options):
        self._options = dict(options)

    def read(self, partition):
        for k in sorted(self._options):
            yield (k, self._options[k])


class FakeCassandraSource(DataSource):
    """Echoes every option it was handed as (opt_key, opt_value) rows."""

    @classmethod
    def name(cls):
        return "fake_cassandra"

    def schema(self):
        return "opt_key string, opt_value string"

    def reader(self, schema):
        return _EchoOptionsReader(self.options)
