from cql_xmlpipe_spark.functions.dockey import sdbm_key_py, sdbm_key_udf, utf16_units
from cql_xmlpipe_spark.functions.xmlfuncs import mem_transform, xml_escape_attr, xml_escape_text

__all__ = [
    "sdbm_key_py",
    "sdbm_key_udf",
    "utf16_units",
    "mem_transform",
    "xml_escape_attr",
    "xml_escape_text",
]
