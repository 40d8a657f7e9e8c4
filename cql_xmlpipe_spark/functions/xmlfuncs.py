"""XML escaping + the embedded-JSON ``<mem>`` transform, as Column exprs.

Escaping reproduces JDK StAX rules (SURVEY §4.3, empirically verified):
text nodes escape ``&ampersand, <, >`` (NOT quotes); attribute values
additionally escape ``"``. Replacement order: ``&`` first.

The ``<mem>`` transform reproduces ``parseString`` (``Query.java:279-301``):
a string field whose first/last chars are ``[..]`` or ``{..}`` is attempted
as JSON ``List<Integer[]>``; on success each inner array renders as
``<mem>i i</mem>`` concatenated inside CDATA; on failure the raw text is
emitted escaped. ``{...}`` can never parse as a list so it always falls
back — ``from_json`` with an array schema gives the same behavior for free.
Divergence: the reference crashes on ``""`` (``Query.java:281`` defect); we
emit the empty string.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MEM_SCHEMA = "array<array<int>>"


def xml_escape_text(col: Column) -> Column:
    """Escape a text node the way JDK StAX writeCharacters does."""
    out = F.replace(col, F.lit("&"), F.lit("&amp;"))
    out = F.replace(out, F.lit("<"), F.lit("&lt;"))
    out = F.replace(out, F.lit(">"), F.lit("&gt;"))
    return out


def xml_escape_attr(col: Column) -> Column:
    """Escape an attribute value (text rules + double-quote)."""
    return F.replace(xml_escape_text(col), F.lit('"'), F.lit("&quot;"))


def mem_transform(col: Column) -> Column:
    """parseString: JSON-shaped text -> CDATA '<mem>..</mem>' stream, else
    escaped raw text. Returns a ready-to-embed XML fragment (never null)."""
    s = F.coalesce(col, F.lit(""))
    parsed = F.from_json(s, MEM_SCHEMA)
    # Jackson's List<Integer[]> parse succeeds only when every element is an
    # int array; from_json nulls out mismatched nodes, so reject any null.
    well_formed = (
        s.startswith("[")
        & s.endswith("]")
        & parsed.isNotNull()
        & F.forall(
            parsed,
            lambda a: a.isNotNull() & F.forall(a, lambda e: e.isNotNull()),
        )
    )
    mem = F.concat(
        F.lit("<![CDATA["),
        F.array_join(
            F.transform(
                parsed,
                lambda a: F.concat(
                    F.lit("<mem>"),
                    F.array_join(a.cast("array<string>"), " "),
                    F.lit("</mem>"),
                ),
            ),
            "",
        ),
        F.lit("]]>"),
    )
    return F.when(well_formed, mem).otherwise(xml_escape_text(s))
