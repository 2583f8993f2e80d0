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

from ..catalog import bigcount_sql, load, register

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

_NTOK_SQL = "CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END"


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


# corpus-mixture epoch weights per source group: high-quality sources
# (src0-4) repeated ~2.5x, mid (src5-9) kept at 1x, the tail (src10+)
# downsampled to 0.25x — the standard "data mixture" knob of LLM
# pretraining, expressed as deterministic per-row arithmetic
_MIX_HI_EPOCHS = 2       # whole epochs for src0-4
_MIX_HI_FRAC_HEX = "8"   # +0.5 epoch via hash gate (8/16)
_MIX_LO_FRAC_HEX = "4"   # src10+: 0.25 epoch


@register(
    "corpus_mix_epoch_weights",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source,
             TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) AS src_idx,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS gate
      FROM documents
    ), copies AS (
      SELECT doc_id, source,
             (CASE WHEN src_idx < 5
                   THEN {_MIX_HI_EPOCHS} + (CASE WHEN gate < '{_MIX_HI_FRAC_HEX}' THEN 1 ELSE 0 END)
                   WHEN src_idx < 10 THEN 1
                   ELSE (CASE WHEN gate < '{_MIX_LO_FRAC_HEX}' THEN 1 ELSE 0 END)
              END) AS n_copies
      FROM w
    )
    SELECT doc_id, source, CAST(unnest(generate_series(1, n_copies)) AS INT) AS epoch
    FROM copies WHERE n_copies > 0
    """,
)
def corpus_mix_epoch_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing with epoch repetition: each source group
    gets a target weight (2.5x / 1x / 0.25x); whole epochs duplicate the
    row via explode(sequence), the fractional epoch is a deterministic
    md5 hash gate. The output is the physical training mixture — one
    row per (doc, epoch). Pure per-row arithmetic + explode: no
    shuffle at all, so the mixture materializes at scan speed at any
    scale, and reruns reproduce the identical mixture (no rand()).
    Sources WITHOUT a digit (possible in foreign corpora; the round-7
    edge-corpus smoke crashed here on ANSI CAST('' AS INT)) take the
    try_cast->NULL path: both CASE branches' NULL comparisons are
    false, so they fall to the hash-gated 0.25x low band — identical
    in both engines, and a no-op on the fixtures (every fixture source
    carries its index)."""
    d = load(spark, sf_dir, "documents")
    src_idx = F.regexp_extract(F.col("source"), r"(\d+)", 1).try_cast("int")
    gate = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    n_copies = (
        F.when(
            src_idx < 5,
            F.lit(_MIX_HI_EPOCHS)
            + (gate < _MIX_HI_FRAC_HEX).cast("int"),
        )
        .when(src_idx < 10, F.lit(1))
        .otherwise((gate < _MIX_LO_FRAC_HEX).cast("int"))
    )
    return (
        d.select("doc_id", "source", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.sequence(F.lit(1), F.col("n_copies"))
            ).alias("epoch"),
        )
    )


# train/val/test gates over the first two hex digits (256 buckets):
# train < 'f0' (240/256), val < 'f8' (8/256), test = rest (8/256)
_SPLIT_TRAIN_LT = "f0"
_SPLIT_VAL_LT = "f8"


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_SPLIT_TRAIN_LT}' THEN 'train'
                WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_SPLIT_VAL_LT}' THEN 'val'
                ELSE 'test' END AS split,
           {bigcount_sql()} AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc,
           MAX(doc_id) AS max_doc
    FROM documents
    GROUP BY 1
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (93.75% / 3.125% / 3.125%)
    keyed on two md5 hex digits of doc_id — a pure function of the key,
    so membership is stable across reruns, partitionings, and engines,
    and a document can never leak between splits. One scan + a 3-group
    aggregate."""
    d = load(spark, sf_dir, "documents")
    b = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(b < _SPLIT_TRAIN_LT, "train")
        .when(b < _SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return (
        d.groupBy(split.alias("split"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


# eval-holdout construction: fixed k docs per language stratum
_HOLDOUT_K = 10


@register(
    "sample_fixed_k_per_stratum",
    oracle=f"""
    SELECT doc_id, lang, rk FROM (
      SELECT doc_id, lang,
             CAST(ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                  AS INT) AS rk
      FROM documents
    ) WHERE rk <= {_HOLDOUT_K}
    """,
)
def sample_fixed_k_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-stratum sample (eval-holdout construction): the k
    smallest md5(doc_id) per language — uniform within each stratum,
    reproducible everywhere, and executed as a per-partition
    WindowGroupLimit (each task keeps k rows per group), no global
    sort."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= _HOLDOUT_K)
    )


_BATCH_SIZE = 64


@register(
    "corpus_shuffle_batches",
    oracle=f"""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             ROW_NUMBER() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
      FROM documents
    )
    SELECT CAST(FLOOR((rn - 1) / {_BATCH_SIZE}) AS INT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM ranked GROUP BY 1
    """,
)
def corpus_shuffle_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle + fixed-size batch assignment: docs
    are ordered by md5(doc_id) (a reproducible permutation — same
    batches on every rerun, unlike rand()), cut into 64-doc batches,
    and summarized per batch. This is the epoch-shuffle step of a
    training dataloader. The global row number is the TWO-PASS
    distributed form (operators/ranking.py): range-partition by the md5
    key (hash order = uniform range bounds, so partitions balance),
    rank within partitions, add broadcast per-partition offsets — no
    single-partition window at any scale."""
    from ..operators.ranking import distributed_row_number

    d = load(spark, sf_dir, "documents")
    ranked = distributed_row_number(
        d.select(
            "doc_id",
            "n_chars",
            F.md5(F.col("doc_id").cast("string")).alias("shuffle_key"),
        ),
        [F.col("shuffle_key"), F.col("doc_id")],
        rn_col="rn",
    )
    return (
        ranked.groupBy(
            F.floor((F.col("rn") - 1) / _BATCH_SIZE).cast("int").alias("batch_id")
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# md5-derived uniform fraction in [0,1): first 8 hex digits as a 32-bit
# integer over 2^32 — the keyed uniform variate every weighted gate uses
_U32 = 4294967296.0
_FRAC_SQL = (
    "(("
    + " + ".join(
        f"CAST((strpos('0123456789abcdef', substring(md5(CAST(doc_id AS VARCHAR)),"
        f" {pp + 1}, 1)) - 1) AS BIGINT) * {16 ** (7 - pp)}"
        for pp in range(8)
    )
    + f") / {_U32})"
)

_QUALITY_SQL = (
    "(0.4 * (CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
    "len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+'), "
    "t -> t IN ('the', 'and', 'of', 'to', 'in', 'is', 'that', 'it'))) END AS DOUBLE) "
    "/ CAST(greatest(CASE WHEN trim(text) = '' THEN 0 ELSE "
    "len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END, 1) AS DOUBLE)) "
    "+ 0.3 * least((CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', '', 'g')) AS DOUBLE) "
    "/ CAST(greatest(CASE WHEN trim(text) = '' THEN 0 ELSE "
    "len(string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')) END, 1) AS DOUBLE)) / 10.0, 1.0) "
    "+ 0.3 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) "
    "/ CAST(greatest(length(text), 1) AS DOUBLE)))"
)


@register(
    "sample_weighted_by_quality",
    oracle=f"""
    SELECT doc_id, {_QUALITY_SQL} AS quality, {_FRAC_SQL} AS u
    FROM documents
    WHERE {_FRAC_SQL} < {_QUALITY_SQL}
    """,
)
def sample_weighted_by_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted deterministic sampling: keep a document with
    probability equal to its quality score, using the md5(doc_id)
    uniform fraction as the keyed variate — high-quality docs survive
    proportionally more often, and the SAME docs survive on every
    rerun, any partitioning, any cluster size (the property rand()
    sampling cannot give a resumable pipeline). Pure per-row predicate:
    rides the scan, no shuffle, no state. The quality expression is the
    doc_quality_scores composite; u reconstructs the first 8 md5 hex
    digits as a 32-bit integer over 2^32, identical in both engines."""
    from ..functions.text import quality_score

    d = load(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / F.lit(_U32)
    )
    q = quality_score(F.col("text"))
    return (
        d.select("doc_id", q.alias("quality"), u.alias("u"))
        .filter(F.col("u") < F.col("quality"))
    )


_NEG_K = 3

# md5-derived 32-bit code of (doc_id | j) — the keyed pseudo-random index
_NEG_CODE = (
    "("
    + " + ".join(
        f"CAST((strpos('0123456789abcdef', substring("
        f"md5(CAST(doc_id AS VARCHAR) || '|' || CAST(j AS VARCHAR)),"
        f" {pp + 1}, 1)) - 1) AS BIGINT) * {16 ** (7 - pp)}"
        for pp in range(8)
    )
    + ")"
)


@register(
    "sample_negative_pairs",
    oracle=f"""
    WITH idx AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS pos,
             COUNT(*) OVER () AS n
      FROM documents
    ),
    wants AS (
      SELECT i.doc_id, j.j, ({_NEG_CODE} % i.n) AS neg_pos
      FROM idx i CROSS JOIN (SELECT unnest(generate_series(1, {_NEG_K})) AS j) j
    )
    SELECT w.doc_id, x.doc_id AS neg_doc_id, CAST(w.j AS INT) AS sample_id
    FROM wants w JOIN idx x ON x.pos = w.neg_pos
    WHERE x.doc_id <> w.doc_id
    """,
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document draws 3 pseudo-random partners via md5(doc_id|j) mod N,
    resolved through a dense position index — the (anchor, negative)
    pair generator behind embedding-model training, reproducible across
    reruns and partitionings the way rand() pairs are not. The
    position-index join is a plain equi-join on pos — AQE picks
    broadcast vs shuffle by size (a corpus-sized index must NOT carry a
    broadcast hint); accidental self-pairs are filtered (each anchor
    keeps >= 2 of its 3 draws). The dense index is the two-pass
    distributed ROW_NUMBER (operators/ranking.py) and the corpus count
    rides along from its per-partition counts — no global window, no
    COUNT() OVER ()."""
    from ..operators.ranking import distributed_row_number

    d = load(spark, sf_dir, "documents")
    idx = distributed_row_number(
        d.select("doc_id"), [F.col("doc_id")], rn_col="__rn", total_col="n"
    ).select(
        "doc_id",
        (F.col("__rn") - 1).cast("bigint").alias("pos"),
        F.col("n").cast("bigint").alias("n"),
    )
    code = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit("|"), F.col("j").cast("string")
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")
    wants = idx.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.lit(_NEG_K))).alias("j"), "n"
    ).select("doc_id", "j", (code % F.col("n")).alias("neg_pos"))
    neg = idx.select(F.col("doc_id").alias("neg_doc_id"), F.col("pos").alias("neg_pos"))
    return (
        wants.join(neg, "neg_pos")
        .filter(F.col("neg_doc_id") != F.col("doc_id"))
        .select("doc_id", "neg_doc_id", F.col("j").cast("int").alias("sample_id"))
    )


@register(
    "corpus_mix_temperature_t2",
    oracle="""
    WITH per AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total,
             CAST(CAST(SUM(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(30,6)))
                       AS VARCHAR) AS DOUBLE) AS w_total
      FROM per
    )
    SELECT source, n_docs,
           (CAST(n_docs AS DOUBLE) / n_total) AS raw_share,
           (CAST(CAST(CAST(sqrt(CAST(n_docs AS DOUBLE)) AS DECIMAL(30,6))
                      AS VARCHAR) AS DOUBLE) / w_total) AS t2_weight
    FROM per CROSS JOIN tot
    """,
)
def corpus_mix_temperature_t2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing at T=2: sampling weight
    proportional to share^(1/2) — the standard upsampling of small
    high-quality sources (and downsampling of the web crawl) in a
    pretraining mixture. T=2 is chosen deliberately: sqrt is the one
    power that is IEEE-exact in both engines (general pow() is a
    transcendental and not bit-portable), and sqrt(n_docs) has the
    same ratios as sqrt(share). Per-source sqrt weights pass through
    DECIMAL(30,6) before the normalizing sum so the total is
    order-independent (catalog.py discipline; a tie at the 6th decimal
    of a sqrt is measure-zero). One source-count aggregate + a 1-row
    broadcast — scan-bound at any corpus size."""
    d = load(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count("*").alias("n_docs"))
    w_dec = F.sqrt(F.col("n_docs").cast("double")).cast("decimal(30,6)")
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("n_total"),
        F.sum(w_dec).cast("string").cast("double").alias("w_total"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("n_docs").cast("double") / F.col("n_total")).alias("raw_share"),
        (w_dec.cast("string").cast("double") / F.col("w_total")).alias("t2_weight"),
    )
