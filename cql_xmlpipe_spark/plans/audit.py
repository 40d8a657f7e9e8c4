"""Plan-shape audits — the row-width moral as executable checks.

The r13 PQ postmortem (SCALE.md): a Sort/Window whose input rows carry
a wide payload column multiplies its spill volume by that payload —
dragging emb+q_emb+lut (~700 B/pair) through the ADC shortlist window
died on disk at the |Q| = N/97 100×-decade shape, while the same sort
over 24 B (q_id, id, adc) rows survived. The sort bill is rows × WIDTH.

:func:`sorted_wide_columns` walks a DataFrame's OPTIMIZED logical plan
and reports every Sort / Window / WindowGroupLimit whose input schema
still carries a wide column (embedding-class arrays, binary payloads) —
so the class of bug is a failing pytest
(tests/test_plans.py::test_no_wide_rows_under_sort_or_window) instead
of a manual decade probe."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: operators whose per-partition buffers hold ENTIRE input rows — a wide
#: column here multiplies sort/spill volume (the r13 lesson)
_ROW_BUFFERING_NODES = ("Sort", "Window", "WindowGroupLimit")

#: dataType.simpleString() prefixes considered "wide payloads": vector
#: arrays and raw binary. (array<int> PQ codes are m*4 bytes — small by
#: construction — and array<string> aggregation outputs are the QUERY's
#: own semantics, so neither is flagged.)
_WIDE_PREFIXES = ("array<float>", "array<double>", "binary")


def sorted_wide_columns(df: DataFrame) -> list[tuple[str, str, str]]:
    """(node, column, dataType) triples for every wide column entering a
    row-buffering operator in ``df``'s optimized logical plan. Empty
    list = the plan keeps vectors/binaries out of every sort buffer
    (fetch-by-id-after-prune, the house discipline)."""
    plan = df._jdf.queryExecution().optimizedPlan()
    bad: list[tuple[str, str, str]] = []

    def walk(node) -> None:
        if node.nodeName() in _ROW_BUFFERING_NODES:
            n_children = node.children().size()
            for ci in range(n_children):
                out = node.children().apply(ci).output()
                for i in range(out.size()):
                    attr = out.apply(i)
                    dt = attr.dataType().simpleString()
                    if dt.startswith(_WIDE_PREFIXES):
                        bad.append((node.nodeName(), attr.name(), dt))
        for ci in range(node.children().size()):
            walk(node.children().apply(ci))
        # subqueries (e.g. scalar guards) hide plans in expressions; the
        # headline retrieval shapes keep everything in the main tree, so
        # the walk stays on children — documented boundary, not an
        # oversight

    walk(plan)
    return bad
