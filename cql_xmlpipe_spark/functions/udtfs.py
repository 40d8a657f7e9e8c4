"""Python UDTFs (table functions, Spark 3.5+ API) — SURVEY §2C's
UDF/UDAF/UDTF surface. One production-shaped example: sentence splitting
as a 1→N lateral expansion (the text-pipeline sibling of frame sampling).
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_BOUNDARY = re.compile(r"[.!?]")
_WS = " \t\n\r"


@udtf(returnType="idx int, sentence string")
class SplitSentences:
    """Emit (idx, sentence) per input text; 1-based idx over the non-empty
    trimmed segments. Whitespace trim set matches the SQL oracle's
    ``trim(x, ' \\t\\n\\r')`` exactly."""

    def eval(self, text: str):  # noqa: D102 - UDTF contract method
        if text is None:
            return
        idx = 0
        for part in _SENT_BOUNDARY.split(text):
            part = part.strip(_WS)
            if part:
                idx += 1
                yield idx, part


def register_udtfs(spark) -> None:
    spark.udtf.register("split_sentences", SplitSentences)
