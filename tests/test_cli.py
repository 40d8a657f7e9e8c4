"""CLI end-to-end tests (A10 + A8 parity sink + scale sink) — the
reference's own invocation surface (``Query.java:41-125``)."""

from __future__ import annotations

import glob
import io
import os
from contextlib import redirect_stdout

import pytest

from cql_xmlpipe_spark.cli import build_parser, main

SF = "/root/testdata/sf0.001"


def test_missing_required_flags_exit_minus_one(capsys):
    assert main(["-cql", "SELECT 1"]) == -1  # no -keys
    assert main(["-keys", "a"]) == -1  # no -cql


def test_parser_reference_flags_present():
    p = build_parser()
    args = p.parse_args(
        ["-host", "h", "-port", "1234", "-user", "u", "-pass", "p",
         "-cql", "SELECT 1", "-keys", "k", "-debug", "/tmp/x"]
    )
    assert args.host == "h" and args.port == 1234
    assert args.password == "p" and args.debug == "/tmp/x"


def test_cli_parity_stream(spark, tmp_path):
    buf = io.StringIO()
    debug_file = str(tmp_path / "dbg.log")
    with redirect_stdout(buf):
        rc = main(
            ["-keys", "o_orderkey",
             "-cql", "SELECT o_orderkey, o_orderstatus FROM orders "
                     "ORDER BY o_orderkey LIMIT 2",
             "-debug", debug_file,
             "--data-dir", SF]
        )
    out = buf.getvalue()
    assert rc == 0
    assert out.startswith('<?xml version="1.0" encoding="utf-8"?><sphinx:docset>')
    assert out.endswith("\n</sphinx:docset>")
    assert '\n<sphinx:document id="0"><o_orderkey>0</o_orderkey>' in out
    assert "<o_orderstatus>" in out
    # A9 debug instrumentation: rows + elapsed logged
    with open(debug_file, encoding="utf-8") as fh:
        assert "rows=2" in fh.read()


def test_cli_scale_out_sink(spark, tmp_path):
    out_dir = str(tmp_path / "xml")
    rc = main(
        ["-keys", "n_nationkey",
         "-cql", "SELECT n_nationkey, n_name FROM nation",
         "--data-dir", SF,
         "--scale-out", out_dir]
    )
    assert rc == 0
    assert os.path.exists(os.path.join(out_dir, "_PROLOG"))
    assert os.path.exists(os.path.join(out_dir, "_CLOSE"))
    lines = []
    for part in glob.glob(f"{out_dir}/part-*"):
        with open(part, encoding="utf-8") as fh:
            lines += [ln for ln in fh.read().split("\n") if ln]
    assert len(lines) == 25  # one document per nation row
    assert all(ln.startswith('<sphinx:document id="') for ln in lines)


def test_cli_golden_byte_parity(spark):
    """Full-stdout golden: the exact byte stream for a mixed-type export
    (int, string→mem, double, date, blob→CDATA) at sf0.001, pinned
    against the empirically-verified StAX framing facts (SURVEY Appendix:
    prolog without standalone, no xmlns on sphinx:docset, '\\n' before
    each document, final '\\n</sphinx:docset>', no self-closing tags).
    Guards the parity sink against any rendering/framing drift."""
    golden_path = os.path.join(
        os.path.dirname(__file__), "fixtures", "cli_golden_orders.xml"
    )
    with open(golden_path, encoding="utf-8", newline="") as fh:
        golden = fh.read()
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["-keys", "o_orderkey",
             "-cql", "SELECT o_orderkey, o_orderstatus, o_totalprice, "
                     "o_orderdate, o_orderpriority, "
                     "CAST(o_orderstatus AS BINARY) AS status_blob "
                     "FROM orders ORDER BY o_orderkey LIMIT 5",
             "--data-dir", SF]
        )
    assert rc == 0
    out = buf.getvalue()
    assert out == golden
    # re-assert the StAX facts directly so a stale regenerated golden
    # can't silently codify a framing regression
    assert out.startswith('<?xml version="1.0" encoding="utf-8"?><sphinx:docset>\n')
    assert "xmlns" not in out and "/>" not in out
    assert out.endswith("</sphinx:document>\n</sphinx:docset>")
    assert "<![CDATA[" in out and "Jan" in out  # blob branch + Date.toString
