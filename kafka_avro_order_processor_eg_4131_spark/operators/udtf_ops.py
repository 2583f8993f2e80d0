"""Python UDTF surface (SURVEY.md §2.7 UDF/UDAF/UDTF row): a
table-valued function producing N rows per input row, registered for
LATERAL use from SQL. The example tokenizer is deliberately something
``posexplode(split(...))`` also expresses — the built-in is the hot
path; the UDTF exists for logic that genuinely needs imperative
row-expansion (parsers, samplers, segmenters)."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

# the PORTABLE whitespace class (round-9 text-edge pin): Java's \s.
# Python's str.split() splits on all Unicode whitespace (NBSP, NEL,
# ideographic space), which neither Java regex \s nor RE2 \s treats as
# a separator — so the UDTF tokenizes with the same explicit class the
# SQL oracles use, mirroring SQL trim (strips spaces only) first.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


@udtf(returnType="word string, idx int")
class ExplodeWords:
    """text -> one row per whitespace token with its position.
    Matches F.split(F.trim(text), r"\\s+") exactly, including the
    empty token a leading tab produces after space-only trim."""

    def eval(self, text: str):
        t = (text or "").strip(" ")
        if t == "":
            return
        for i, w in enumerate(_WS.split(t)):
            yield w, i


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("explode_words", ExplodeWords)
