"""CLI front-end — flag-compatible with the reference (``Query.java:41-125``).

    python -m cql_xmlpipe_spark.cli -keys url,pos -cql "SELECT ... FROM t"

Reference flags reproduced: ``-host -port -user -pass -cql -keys -debug``.
``-cql`` is executed by Spark SQL (Catalyst) instead of being forwarded to
a Cassandra server; tables resolve from ``--data-dir`` parquet (or the
Cassandra connector when its jar is on the classpath). Missing required
flags print usage and exit -1, like commons-cli does (``Query.java:121-125``).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="query",
        description="Execute a SQL SELECT and stream the result as a Sphinx "
        "xmlpipe2 document stream to stdout.",
    )
    # reference flags (Query.java:44-80); host/port/user/pass apply only to
    # the Cassandra connector path and are accepted for interface parity.
    p.add_argument("-host", default="localhost", help="Cassandra contact point")
    p.add_argument("-port", type=int, default=9042, help="Cassandra native port")
    p.add_argument("-user", default=None)
    p.add_argument("-pass", dest="password", default=None)
    p.add_argument("-cql", required=True, help="SELECT statement to execute")
    p.add_argument(
        "-keys",
        required=True,
        help="comma-separated key columns for document-id generation (max 100)",
    )
    p.add_argument("-debug", default=None, metavar="FILE", help="progress log file")
    # engine extensions
    p.add_argument("--data-dir", default=None, help="directory of <table>.parquet files")
    p.add_argument("--mode", choices=["parity", "sane"], default="parity")
    p.add_argument("--scale-out", default=None, metavar="DIR", help="write partitioned XML here")
    return p


def main(argv: list[str] | None = None) -> int:
    try:
        args = build_parser().parse_args(argv)
    except SystemExit:
        return -1
    keys = [k for k in args.keys.split(",") if k][:100]  # Query.java:112-119

    from cql_xmlpipe_spark.operators.xmlpipe import (
        write_docset_scale,
        write_docset_stream,
        xml_documents,
    )
    from cql_xmlpipe_spark.session import get_spark
    from cql_xmlpipe_spark.sources.registry import DEFAULT_SF_DIR, register_views

    spark = get_spark("cql-xmlpipe-cli")
    register_views(spark, args.data_dir or DEFAULT_SF_DIR)

    t0 = time.time()
    df = spark.sql(args.cql)
    docs = xml_documents(df, keys, mode=args.mode)
    if args.scale_out:
        write_docset_scale(docs, args.scale_out)
        n = None
    else:
        n = write_docset_stream(docs, sys.stdout)
    if args.debug:
        with open(args.debug, "a", encoding="utf-8") as fh:
            fh.write(f"rows={n} elapsed_ms={int((time.time() - t0) * 1000)}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
