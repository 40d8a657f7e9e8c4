"""cql_xmlpipe_spark — a PySpark-native analytics/ETL engine.

Re-implements, Spark-first, the query and data-processing capabilities of
the reference exporter (``Denis-Mak/cql-xmlpipe``, a Cassandra→Sphinx
xmlpipe2 streamer, see ``/root/reference/src/main/java/ru/factsearch/
Query.java``), and extends them with large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design notes
------------
* Everything is declared through the DataFrame / Spark SQL API so Catalyst
  performs pushdown, pruning, join planning and AQE re-planning; the only
  Python-boundary code paths are Arrow-batched pandas UDFs (doc-key hash,
  MinHash/SimHash signatures, multimodal decode stubs).
* The reference's in-process kernel (type rendering, surrogate-key hash,
  embedded-JSON ``<mem>`` transform, xmlpipe2 serialization) is rebuilt as
  pure Column expressions wherever possible so it stays inside
  whole-stage codegen.
"""

from cql_xmlpipe_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
