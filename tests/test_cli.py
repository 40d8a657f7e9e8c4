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
