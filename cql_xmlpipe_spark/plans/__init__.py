from cql_xmlpipe_spark.plans.queries import ORACLE, QUERIES
from cql_xmlpipe_spark.plans import kernel as _kernel  # noqa: F401 (registers)
from cql_xmlpipe_spark.plans import extensions as _extensions  # noqa: F401
from cql_xmlpipe_spark.plans import tpch as _tpch  # noqa: F401 (registers)

__all__ = ["ORACLE", "QUERIES"]
