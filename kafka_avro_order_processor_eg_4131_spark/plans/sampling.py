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

from pyspark.sql import Column, DataFrame, SparkSession, Window
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


# context-window budget for sequence packing (tokens per training batch)
_PACK_BUDGET = 2048

_NTOK_SQL = "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\\s+')) END"


@register(
    "pack_sequences_by_budget",
    oracle=f"""
    WITH t AS (
      SELECT source, doc_id,
             CAST({_NTOK_SQL} AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT source, doc_id, n_tok,
             CAST(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum
      FROM t
    )
    SELECT source,
           (cum - n_tok) // {_PACK_BUDGET} AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM c
    GROUP BY source, bin
    ORDER BY source, bin
    """,
)
def pack_sequences_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training-batch assembly: within each source
    (the natural corpus shard), documents are laid out in doc_id order
    and cut into bins of ~2048 tokens by start-offset chunking — a doc
    starts a new bin when the running token count before it crosses the
    budget. One window cumsum partitioned by source (each source is an
    independent task; no global sort) and one group-by. At 100 TB the
    per-source window is the scalable layout: sources partition the
    corpus, so no single-partition window materializes. Integer `div`
    in Spark and `//` in DuckDB both truncate toward zero on
    non-negative cums, so bins agree exactly."""
    from ..functions.text import token_count

    d = load(spark, sf_dir, "documents")
    t = d.select(
        "source", "doc_id", token_count(F.col("text")).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w).cast("bigint"))
    return (
        c.withColumn(
            "bin", F.expr(f"(cum - n_tok) div {_PACK_BUDGET}")
        )
        .groupBy("source", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("source", "bin")
    )


# fixed-size deterministic sample: k docs with the smallest md5(doc_id)
_TOPK_K = 50


@register(
    "sample_fixed_k_hash_rank",
    oracle=f"""
    SELECT doc_id, lang, source,
           md5(CAST(doc_id AS VARCHAR)) AS rank_key
    FROM documents
    ORDER BY rank_key, doc_id
    LIMIT {_TOPK_K}
    """,
)
def sample_fixed_k_hash_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size deterministic sample (the reservoir-sampling twin):
    rank every row by md5(key) and keep the k smallest — a uniform
    k-of-n sample that is a pure function of the keys, reproducible
    across reruns, partitionings, and engines. Spark executes this as
    TakeOrderedAndProject: each task keeps its local top-k, the driver
    merges k-sized heaps — no global sort, no shuffle of the data, so
    it scales to 100 TB with O(k) memory per task. doc_id tiebreak
    pins the order even under (astronomically unlikely) md5 ties."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            F.md5(F.col("doc_id").cast("string")).alias("rank_key"),
        )
        .orderBy("rank_key", "doc_id")
        .limit(_TOPK_K)
    )
