from cql_xmlpipe_spark.operators.xmlpipe import (
    with_doc_id,
    xml_documents,
    write_docset_scale,
    write_docset_stream,
)

__all__ = [
    "with_doc_id",
    "xml_documents",
    "write_docset_scale",
    "write_docset_stream",
]
