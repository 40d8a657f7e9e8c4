"""Type-render scalar kernel: Spark value → text, per SURVEY §1.2.

Mirrors the reference's ``getValue`` dispatch (``Query.java:231-266``) as
pure Column expressions (JVM-side, codegen'd — no Python in this path).

Documented divergences from the reference (each a reference *defect*,
SURVEY §1.2):
  * blob: reference prints ``ByteBuffer.toString()`` buffer metadata; we
    emit hex (``Query.java:225,243`` defect).
  * counter/bigint-as-int paths: reference's driver getInt type-checks and
    throws; we render the integral value.
  * map/tuple/UDT: reference silently emits "" (``Query.java:265``);
    parity mode matches, sane mode emits JSON.
  * NULL anywhere: reference NPEs or zeroes; we render "".
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: java.util.Date.toString() pattern (Query.java:252-253 renders timestamps
#: via row.getDate().toString()); TZ pinned to UTC by the session factory.
JAVA_DATE_PATTERN = "EEE MMM dd HH:mm:ss zzz yyyy"


def render_value(col: Column, dtype: T.DataType, mode: str = "parity") -> Column:
    """Render one column to its text form. Never returns NULL (nulls -> '').

    mode="parity": match the reference's observable output where it is not
    a crash-defect. mode="sane": modern defaults (ISO timestamps, JSON for
    nested types).
    """
    if isinstance(dtype, T.StringType):
        out = col
    elif isinstance(dtype, (T.IntegerType, T.LongType, T.ShortType, T.ByteType)):
        out = col.cast("string")
    elif isinstance(dtype, T.BooleanType):
        out = col.cast("string")  # 'true'/'false', matches Boolean.toString
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        # Spark's cast(double->string) is Java Double.toString ('1.0',
        # '1.0E10'), which is exactly the reference's format.
        out = col.cast("string")
    elif isinstance(dtype, T.DecimalType):
        out = col.cast("string")  # BigDecimal.toString semantics
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        if mode == "parity":
            out = F.date_format(col, JAVA_DATE_PATTERN)
        else:
            out = F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    elif isinstance(dtype, T.DateType):
        out = col.cast("string")
    elif isinstance(dtype, T.BinaryType):
        out = F.hex(col)  # divergence: reference prints buffer metadata
    elif isinstance(dtype, T.ArrayType):
        # set<T>/list<T> -> space-joined elements; empty -> ""
        # (Query.java:257-263,268-277)
        out = F.array_join(
            F.transform(col, lambda e: render_value(e, dtype.elementType, mode)),
            " ",
            null_replacement="",
        )
    elif isinstance(dtype, (T.MapType, T.StructType)):
        # reference: silent fall-through to "" (Query.java:265)
        out = F.lit("") if mode == "parity" else F.to_json(col)
    else:
        out = col.cast("string")
    return F.coalesce(out, F.lit(""))
