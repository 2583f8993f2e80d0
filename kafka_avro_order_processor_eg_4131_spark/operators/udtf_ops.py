"""Python UDTF surface (SURVEY.md §2.7 UDF/UDAF/UDTF row): a
table-valued function producing N rows per input row, registered for
LATERAL use from SQL. The example tokenizer is deliberately something
``posexplode(split(...))`` also expresses — the built-in is the hot
path; the UDTF exists for logic that genuinely needs imperative
row-expansion (parsers, samplers, segmenters)."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType="word string, idx int")
class ExplodeWords:
    """text -> one row per whitespace token with its position."""

    def eval(self, text: str):
        for i, w in enumerate((text or "").split()):
            yield w, i


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("explode_words", ExplodeWords)
