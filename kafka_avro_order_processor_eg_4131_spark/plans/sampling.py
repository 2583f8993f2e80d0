"""Deterministic sampling over ``documents`` (north-star extension).

A training-data pipeline cannot use ``rand()`` sampling: re-running the
job must pick the SAME rows (resumability, auditability), and Spark's
``sample()``/``sampleBy()`` are seed-stable only for a fixed partition
layout — repartition the input and the sample changes. The
industry-standard fix is hash-gated Bernoulli sampling: a row is kept
iff ``hash(key) < rate``, a pure per-row predicate that is independent
of partitioning, cluster size, and execution order, and pushes down to
the scan like any other filter. Both queries here gate on the first
hex digit of ``md5(key)`` — 16 equal buckets under md5's uniformity —
which DuckDB reproduces bit-for-bit, so the oracle is exact.

Reference parity note: the reference has no sampling surface (SURVEY.md
SS2.7); this is the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, register

# first-hex-digit gate: digit < threshold keeps (threshold/16) of rows
_UNIFORM_HEX_LT = "4"  # 4/16 = 25%
# language rebalancing: downsample dominant 'en', keep the tail
_STRATA_HEX_LT = {"en": "4", "default": "c"}  # en 25%, others 75%


def _gate(key: Column, threshold: str) -> Column:
    return F.substring(F.md5(key.cast("string")), 1, 1) < threshold


@register(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '{_UNIFORM_HEX_LT}'
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25% Bernoulli sample: keep iff the first hex digit
    of md5(doc_id) < '4'. Unlike df.sample(), the kept set is a pure
    function of the key — stable across repartitioning, cluster sizes,
    and reruns — and the gate is an ordinary filter, so at 100 TB it
    rides predicate pushdown instead of materializing a shuffled
    sample."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", "source", "n_chars").filter(
        _gate(F.col("doc_id"), _UNIFORM_HEX_LT)
    )


@register(
    "sample_stratified_by_lang",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS sampled_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars
    FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
          < (CASE WHEN lang = 'en' THEN '{_STRATA_HEX_LT["en"]}'
                  ELSE '{_STRATA_HEX_LT["default"]}' END)
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (the sampleBy() twin a
    reproducible pipeline actually wants): per-stratum hash gates
    rebalance the corpus — dominant 'en' kept at 25%, every other
    language at 75% — then aggregate per language. One scan, one
    map-side filter, one shuffle for the tiny group-by; no rand(), no
    seed/partitioning coupling."""
    d = load(spark, sf_dir, "documents")
    threshold = F.when(
        F.col("lang") == "en", F.lit(_STRATA_HEX_LT["en"])
    ).otherwise(F.lit(_STRATA_HEX_LT["default"]))
    return (
        d.filter(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) < threshold)
        .groupBy("lang")
        .agg(
            F.count("*").alias("sampled_docs"),
            F.sum("n_chars").cast("bigint").alias("sampled_chars"),
        )
        .orderBy("lang")
    )
