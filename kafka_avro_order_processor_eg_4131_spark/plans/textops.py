"""Text-analysis queries over ``documents`` (north-star extension;
functions in functions/text.py). All JVM-side expressions; per-row
arithmetic only, so Spark/DuckDB agree bit-for-bit without the decimal
trick."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, register
from ..operators import cache as C
from ..functions import text as T

# SQL twins of the functions/text.py helpers ---------------------------------

_TOKENS = "string_split_regex(trim(text), '[ \\t\\n\\x0b\\f\\r]+')"
_NTOK = f"CASE WHEN trim(text) = '' THEN 0 ELSE len({_TOKENS}) END"


def _hits_sql(words: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return (
        f"CASE WHEN trim(text) = '' THEN 0 ELSE "
        f"len(list_filter({_TOKENS}, t -> t IN ({inlist}))) END"
    )


_ALPHA = "(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)" \
         " / CAST(greatest(length(text), 1) AS DOUBLE))"
_SOLID = "CAST(length(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', '', 'g')) AS DOUBLE)"
_AVGLEN = f"({_SOLID} / CAST(greatest({_NTOK}, 1) AS DOUBLE))"
_STOPRATIO = (
    f"(CAST({_hits_sql(T.LANG_STOPWORDS['en'])} AS DOUBLE)"
    f" / CAST(greatest({_NTOK}, 1) AS DOUBLE))"
)


def doc_fp_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, fp): the canonicalized-fingerprint relation —
    normalize (whitespace collapse + portable casefold) + md5 over the
    full corpus — computed ONCE per session via the family registry.
    Round-10 hoist (round-9 verdict item 1c): four entries each
    re-derived this from the parquet scan — dedup_exact_groups, the
    clean-corpus keeper aggregate, corpus_dedup_rate_by_source, and
    doc_fingerprint — plus the exact-rep map that every pair family
    builds on; now they all read ~50 bytes/doc of persisted rows.
    Lives here (not plans/dedup.py) because dedup imports textops'
    SQL fragments — same direction as the existing dependency."""

    def build() -> DataFrame:
        return load(spark, sf_dir, "documents").select(
            "doc_id", "source", T.fingerprint(F.col("text")).alias("fp")
        )

    return C.family(spark, "text.doc_fp", sf_dir, build)


@register(
    "doc_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST({_NTOK} AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           {_AVGLEN} AS avg_token_len
    FROM documents
    """,
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) + character stats."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        F.length(t).cast("bigint").alias("n_chars"),
        T.avg_token_len(t).alias("avg_token_len"),
    )


@register(
    "doc_quality_scores",
    oracle=f"""
    SELECT doc_id,
           {_STOPRATIO} AS stopword_ratio,
           {_ALPHA} AS alpha_ratio,
           (0.4 * {_STOPRATIO}
            + 0.3 * least({_AVGLEN} / 10.0, 1.0)
            + 0.3 * {_ALPHA}) AS quality_score
    FROM documents
    """,
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stopword density, alphabetic purity, composite
    score — the cheap pre-filter stage of a training-data pipeline."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        T.stopword_ratio(t).alias("stopword_ratio"),
        T.alpha_ratio(t).alias("alpha_ratio"),
        T.quality_score(t).alias("quality_score"),
    )


@register(
    "doc_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {_hits_sql(T.LANG_STOPWORDS['en'])} AS s_en,
             {_hits_sql(T.LANG_STOPWORDS['de'])} AS s_de,
             {_hits_sql(T.LANG_STOPWORDS['fr'])} AS s_fr,
             {_hits_sql(T.LANG_STOPWORDS['es'])} AS s_es
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM scored
    """,
)
def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via per-language stopword-hit argmax (deterministic
    tie order en>de>fr>es)."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", T.lang_id(F.col("text")).alias("lang_pred"))


@register(
    "udtf_explode_words",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS} AS toks FROM documents WHERE trim(text) <> ''
    )
    SELECT doc_id,
           unnest(toks) AS word,
           CAST(unnest(generate_series(0, len(toks) - 1)) AS INT) AS idx
    FROM t
    """,
)
def udtf_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF via LATERAL join (operators/udtf_ops.py): tokenizer as
    a table-valued function; oracle is the zipped-unnest equivalent."""
    from ..operators.udtf_ops import register_udtfs
    from ..sources.tables import sql_over_views

    d = load(spark, sf_dir, "documents")
    register_udtfs(spark)
    return sql_over_views(
        spark,
        """
        SELECT doc_id, word, idx
        FROM {documents}, LATERAL explode_words(text)
        WHERE trim(text) <> ''
        """,
        documents=d,
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i')) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over whitespace-normalized lowercase
    text — the exact-dedup key (from the session-shared fingerprint
    relation)."""
    return doc_fp_cached(spark, sf_dir).select("doc_id", "fp")


@register(
    "doc_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id,
             unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (
      SELECT id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE term <> '' GROUP BY id, term
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT id) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT CAST(COUNT(DISTINCT id) AS BIGINT) AS n_docs FROM tf),
    scored AS (
      SELECT tf.id AS doc_id, tf.term, tf.tf,
             (CAST(tf.tf AS DOUBLE) * n.n_docs) / df.df AS score
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, score, rank FROM (
      SELECT doc_id, term, tf, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 3
    """,
)
def doc_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinguishing terms per document by tf-idf-style score.
    The idf factor is the LINEAR rarity N/df, not log(N/df): same
    ranking monotonicity, but no transcendental — ln() is not
    bit-portable across engines (catalog.py determinism rules). Two
    aggregations (term-frequency, document-frequency) over the same
    exploded token rows, a broadcast 1-row corpus count, and a
    windowed top-k."""
    from ..functions.text import norm_tokens
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents"))
    tok_rows = d.select(
        F.col("doc_id").alias("id"),
        F.explode(norm_tokens((F.col("text")))).alias("term"),
    ).filter(F.col("term") != "")
    # tf feeds THREE consumers (df, the corpus count, and the scored
    # join); persisted so the explode+aggregate pipeline runs once, and
    # the per-term/corpus-level aggregates broadcast back onto it
    # (A/B at sf0.1: 6.3s -> 3.6s cold, neutral warm)
    tf = C.ephemeral(tok_rows.groupBy("id", "term").agg(F.count("*").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count_distinct("id").alias("df"))
    n = tf.agg(F.count_distinct("id").alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n))
        .select(
            F.col("id").alias("doc_id"),
            "term",
            "tf",
            ((F.col("tf").cast("double") * F.col("n_docs")) / F.col("df")).alias(
                "score"
            ),
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


# Rabin-Karp-style rolling fingerprint: token code = first 8 hex digits
# of md5(token) as an integer (portable: DuckDB reconstructs it digit by
# digit, Spark uses conv(hex,16,10)); window hash = code[i]*B^2 +
# code[i+1]*B + code[i+2] with B=31 (max ~4e9*961*3 < 2^63, no overflow,
# no modulus needed); fingerprint = min over windows.
_RK_B = 31
_RK_K = 3


def _code_sql(tok_expr: str) -> str:
    terms = " + ".join(
        f"CAST((strpos('0123456789abcdef', substring(md5({tok_expr}), {p + 1}, 1)) - 1)"
        f" AS BIGINT) * {16 ** (7 - p)}"
        for p in range(8)
    )
    return f"({terms})"


@register(
    "doc_rolling_fingerprint",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '') AS toks
      FROM documents
    )
    SELECT doc_id,
           list_min(list_transform(
             generate_series(1, greatest(len(toks) - {_RK_K - 1}, 0)),
             i -> {_code_sql("toks[i]")} * {_RK_B ** 2}
                + {_code_sql("toks[i+1]")} * {_RK_B}
                + {_code_sql("toks[i+2]")}
           )) AS rolling_fp,
           CAST(greatest(len(toks) - {_RK_K - 1}, 0) AS INT) AS n_windows
    FROM t
    """,
)
def doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (Rabin-Karp over 3-token
    windows, min-sampled): robust to content shifts in a way the
    whole-text md5 (doc_fingerprint) is not — a one-word edit changes
    only the windows containing it, so the min survives unless the
    minimal window itself was edited. All JVM array expressions; docs
    shorter than 3 tokens fingerprint as NULL."""
    from ..functions.text import norm_tokens

    d = load(spark, sf_dir, "documents")
    toks = norm_tokens((F.col("text")))

    def code(tok):
        return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")

    def window_hash(toks_col, i):
        return (
            code(F.element_at(toks_col, (i + 1).cast("int"))) * (_RK_B ** 2)
            + code(F.element_at(toks_col, (i + 2).cast("int"))) * _RK_B
            + code(F.element_at(toks_col, (i + 3).cast("int")))
        )

    idx = F.sequence(F.lit(0), F.size(toks) - _RK_K)
    hashes = F.when(F.size(toks) >= _RK_K, F.transform(idx, lambda i: window_hash(toks, i)))
    return d.select(
        "doc_id",
        F.array_min(hashes).alias("rolling_fp"),
        F.greatest(F.size(toks) - (_RK_K - 1), F.lit(0)).cast("int").alias("n_windows"),
    )


@register(
    "doc_bigram_counts",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '') AS toks
      FROM documents
    ), grams AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i+1]
             )) AS bigram
      FROM t
    )
    SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def doc_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigram counts — the n-gram language-model
    statistic (and the shingle histogram a dedup pipeline profiles
    first). The bigram list is built per row with JVM array
    expressions (no UDF, no self-join), exploded, and hash-aggregated;
    Spark's partial aggregation means the shuffle carries one row per
    distinct bigram per task, and TakeOrderedAndProject caps the
    result. Tie at the cutoff broken by bigram text. Bigrams come from
    zip_with over two shifted slices of a ONE-TIME token projection
    (tokenize-once matters: expression trees that re-reference the
    regex split inside lambdas defeat subexpression elimination and
    re-tokenize per reference)."""
    from ..functions.text import norm_tokens
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents"))
    t = d.select(norm_tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    )
    return (
        t.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(20)
    )


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS}) AS tok
      FROM documents WHERE trim(text) <> ''
    ), tc AS (
      SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok
    ), per AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tok,
             CAST(COUNT(*) AS BIGINT) AS n_distinct,
             CAST(MAX(c) AS BIGINT) AS top_c
      FROM tc GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_tok, 0) AS n_tokens,
           CAST(COALESCE(per.n_distinct, 0) AS DOUBLE)
             / CAST(greatest(COALESCE(per.n_tok, 0), 1) AS DOUBLE) AS distinct_ratio,
           CAST(COALESCE(per.top_c, 0) AS DOUBLE)
             / CAST(greatest(COALESCE(per.n_tok, 0), 1) AS DOUBLE) AS top_token_ratio
    FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
    """,
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: distinct-
    token ratio (low => boilerplate) and the fraction of tokens taken by
    the single most frequent token. Shape: explode -> two hash
    aggregations keyed by doc_id -> left join back so empty docs keep a
    row. Both aggs are map-side-combinable and share the (doc_id, tok)
    shuffle key; at 100 TB this is one shuffle of per-doc vocabularies,
    never a per-doc Python loop. Ratios are bigint/bigint -> double, the
    same IEEE divide on both engines, so the oracle is bit-exact."""
    d = load(spark, sf_dir, "documents")
    toks = d.filter(F.trim("text") != "").select(
        "doc_id", F.explode(T.tokens(F.col("text"))).alias("tok")
    )
    per = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    n_tok = F.coalesce(F.col("n_tok"), F.lit(0)).cast("bigint")
    denom = F.greatest(n_tok, F.lit(1)).cast("double")
    return d.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        n_tok.alias("n_tokens"),
        (F.coalesce(F.col("n_distinct"), F.lit(0)).cast("double") / denom).alias(
            "distinct_ratio"
        ),
        (F.coalesce(F.col("top_c"), F.lit(0)).cast("double") / denom).alias(
            "top_token_ratio"
        ),
    )


# benchmark-decontamination parameters: every 97th doc plays the role of
# an eval/benchmark document; a training doc is contaminated when >= 50%
# of its distinct trigrams appear in ANY benchmark doc
_DECON_MOD = 97
_DECON_THRESHOLD = 0.5


@register(
    "decontam_trigram_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')
               AS toks
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 2, 0)),
               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
             )) AS gram
      FROM toks
    ), bench AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % {_DECON_MOD} = 0
    ), train AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(COUNT(*) FILTER (WHERE bench.gram IS NOT NULL) AS BIGINT)
               AS n_shared
      FROM grams LEFT JOIN bench USING (gram)
      WHERE doc_id % {_DECON_MOD} <> 0
      GROUP BY doc_id
    )
    SELECT doc_id, n_grams, n_shared,
           CAST(n_shared AS DOUBLE) / CAST(greatest(n_grams, 1) AS DOUBLE)
             AS overlap_frac
    FROM train
    WHERE CAST(n_shared AS DOUBLE) / CAST(greatest(n_grams, 1) AS DOUBLE)
          >= {_DECON_THRESHOLD}
    """,
)
def decontam_trigram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents whose distinct
    normalized-trigram set overlaps a held-out benchmark set (doc_id %
    97 == 0 stands in for the eval suite) by >= 0.5. The benchmark
    gram set is tiny relative to the corpus, so Spark broadcasts it and
    the contamination check is a map-side hash probe per trigram — no
    shuffle of the 100 TB side beyond the per-doc distinct/count agg.
    Counts are exact on both engines; the final divide is the same IEEE
    op, so the oracle is bit-exact."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents"))
    toks = T.norm_tokens(F.col("text"))
    tri = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 3),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, (i + 1).cast("int")),
                F.element_at(toks, (i + 2).cast("int")),
                F.element_at(toks, (i + 3).cast("int")),
            ),
        ),
    )
    # per-row array_distinct == global DISTINCT(doc_id, gram), minus the
    # corpus-wide shuffle the latter would cost; rows arrive pre-deduped.
    # The benchmark and training doc sets are disjoint (doc_id % 97), so
    # filtering BEFORE tokenize means each document is tokenized exactly
    # once across the two branches, with the doc_id predicate at the scan.
    bench = (
        d.filter(F.col("doc_id") % _DECON_MOD == 0)
        .select(F.explode(F.array_distinct(tri)).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    # single tokenize pass over the training side: explode the distinct
    # grams once, LEFT-probe the broadcast benchmark set, and take BOTH
    # n_grams (count of all rows) and n_shared (count of probe hits)
    # from the same map-side-combining aggregate — explode preserves
    # row locality, so the shuffle carries ~one partial row per doc.
    # (The earlier two-pass form — hits-only INNER aggregate plus a
    # separate size projection — tokenized the corpus twice; A/B at
    # sf0.1: 2.4s -> 1.7s warm, 6.7s -> 2.3s cold.)
    train = d.filter(F.col("doc_id") % _DECON_MOD != 0)
    agg = (
        train.select("doc_id", F.explode(F.array_distinct(tri)).alias("gram"))
        .join(F.broadcast(bench), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_shared"),
        )
    )
    frac = F.col("n_shared").cast("double") / F.greatest(
        F.col("n_grams"), F.lit(1)
    ).cast("double")
    return agg.select(
        "doc_id", "n_grams", "n_shared", frac.alias("overlap_frac")
    ).filter(F.col("overlap_frac") >= _DECON_THRESHOLD)


@register(
    "doc_quality_deciles",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, lang,
             (0.4 * {_STOPRATIO}
              + 0.3 * least({_AVGLEN} / 10.0, 1.0)
              + 0.3 * {_ALPHA}) AS quality
      FROM documents
    ),
    d AS (
      SELECT lang, quality,
             CAST(NTILE(10) OVER (PARTITION BY lang
                                  ORDER BY quality, doc_id) AS INT) AS decile
      FROM q
    )
    SELECT lang, decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(quality) AS min_q,
           MAX(quality) AS max_q
    FROM d GROUP BY lang, decile
    """,
)
def doc_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality deciles (NTILE partitioned by lang — no
    global sort; each language sorts independently) with per-decile
    doc counts and quality bounds: the threshold table a pipeline uses
    to pick 'keep the top-k deciles per language'. (doc_id tiebreak
    pins NTILE's bucket boundaries under equal scores.)"""
    from pyspark.sql import Window

    from ..functions.text import quality_score

    d = load(spark, sf_dir, "documents")
    q = d.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("quality")
    )
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        q.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .groupBy("lang", "decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("quality").alias("min_q"),
            F.max("quality").alias("max_q"),
        )
    )


# fixed-token chunking for context assembly: 64-token chunks, stride 48
# (16-token overlap between consecutive chunks)
_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@register(
    "doc_chunk_fixed_tokens",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS} AS toks, len({_TOKENS}) AS n
      FROM documents WHERE trim(text) <> ''
    ),
    c AS (
      SELECT doc_id, toks,
             CAST(unnest(generate_series(0, (n - 1) // {_CHUNK_STRIDE})) AS INT)
               AS chunk_idx
      FROM t
    )
    SELECT doc_id, chunk_idx,
           CAST(len(list_slice(toks, chunk_idx * {_CHUNK_STRIDE} + 1,
                               chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_LEN}))
                AS BIGINT) AS n_chunk_tokens,
           array_to_string(list_slice(toks, chunk_idx * {_CHUNK_STRIDE} + 1,
                                      chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_LEN}),
                           ' ') AS chunk_text
    FROM c
    """,
)
def doc_chunk_fixed_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (64-token chunks, stride
    48) — the context-window preparation step of a RAG / pretraining
    pipeline. chunk starts are a per-row integer sequence, so the whole
    operator is project + explode at scan speed: no shuffle, no UDF,
    and chunk boundaries are a pure function of the token array
    (identical on re-runs and engines)."""
    d = load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    # raw-case whitespace tokenizer (chunk text preserves original case)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n = F.size(toks)
    c = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0), ((n - 1) / _CHUNK_STRIDE).cast("int"))
        ).alias("chunk_idx"),
    )
    sl = F.slice(
        F.col("toks"),
        F.col("chunk_idx") * _CHUNK_STRIDE + 1,
        _CHUNK_LEN,
    )
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(sl).cast("bigint").alias("n_chunk_tokens"),
        F.concat_ws(" ", sl).alias("chunk_text"),
    )


# per-source token budget for quality-ranked corpus selection
_SELECT_BUDGET = 600


@register(
    "corpus_select_token_budget",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             (0.4 * {_STOPRATIO}
              + 0.3 * least({_AVGLEN} / 10.0, 1.0)
              + 0.3 * {_ALPHA}) AS quality,
             CAST({_NTOK} AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, quality, n_tok,
             CAST(SUM(n_tok) OVER (PARTITION BY source
                                   ORDER BY quality DESC, doc_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM q
    )
    SELECT doc_id, source, quality, n_tok, cum_tokens
    FROM c WHERE cum_tokens <= {_SELECT_BUDGET}
    """,
)
def corpus_select_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-ranked corpus selection under a token budget: within each
    source, take documents best-first until the running token count
    hits the budget — 'give me the best ~3k tokens per source'. The
    window partitions by source, so there is no global sort; each
    source ranks independently (the per-stratum budget is also what a
    real mixture wants). doc_id tiebreak keeps the cut deterministic
    under equal quality scores."""
    from pyspark.sql import Window

    from ..functions.text import quality_score, token_count

    d = load(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "source",
        quality_score(F.col("text")).alias("quality"),
        token_count(F.col("text")).alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tok").over(w).cast("bigint"))
        .filter(F.col("cum_tokens") <= _SELECT_BUDGET)
    )


@register(
    "pii_mask_customers",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked_name,
           CAST(length(c_name)
                - length(regexp_replace(c_name, '[0-9]', '', 'g')) AS INT)
             AS n_digits_masked
    FROM customer
    """,
)
def pii_mask_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-redaction kernel: mask every digit in the customer name and
    count how many characters were redacted. The fixture has no real
    PII (emails/phones), so digits stand in for the sensitive class;
    a production pipeline swaps the character class for email/phone/
    SSN regexes (still one JVM-side regexp_replace per pattern — the
    plumbing, pushdown behavior, and audit-count output are what this
    operator pins). Pure per-row projection: no shuffle at any scale."""
    c = load(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.regexp_replace(name, "[0-9]", "#").alias("masked_name"),
        (
            F.length(name) - F.length(F.regexp_replace(name, "[0-9]", ""))
        ).cast("int").alias("n_digits_masked"),
    )


@register(
    "doc_postings_lists",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')))
               AS term
      FROM documents WHERE trim(text) <> ''
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           array_to_string(
             list_transform(
               list_slice(list(doc_id ORDER BY doc_id), 1, 100),
               x -> CAST(x AS VARCHAR)
             ), ',') AS postings
    FROM tok GROUP BY term
    """,
)
def doc_postings_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, its document frequency and the
    first 100 postings (doc_ids, ascending) — the search/retrieval twin
    of doc_top_terms. explode(distinct tokens) -> one hash aggregate on
    term; the postings cap bounds per-term state the way a real indexer
    segments long postings lists, so a scale-up changes row width, not
    memory behavior. collect_list is safe HERE because the cap is
    applied immediately after sorting; unbounded collect_list over a
    100 TB corpus would not be (the uncapped form should write postings
    segments instead)."""
    d = load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    tok = d.select(
        "doc_id",
        F.explode(F.array_distinct(T.norm_tokens(F.col("text")))).alias("term"),
    )
    # postings emitted as a CSV string (not array<bigint>): the driver's
    # canonicalizer cannot hash array cells; sort numerically BEFORE the
    # string cast so "10" doesn't sort ahead of "2"
    return tok.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list("doc_id")), 1, 100),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings"),
    )


@register(
    "vocab_term_ids",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS term
      FROM documents WHERE trim(text) <> ''
    )
    SELECT term,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, term) - 1 AS INT)
             AS term_id
    FROM toks GROUP BY term
    """,
)
def vocab_term_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary construction: dense integer ids assigned by corpus
    frequency (most frequent term = id 0; ties by term text) — the
    token->id table every training pipeline builds before
    numericalization, and the seed ranking a BPE trainer starts from.
    One explode + hash aggregate; the id assignment runs over the
    VOCABULARY (post-aggregation, orders of magnitude smaller than the
    corpus) and uses the two-pass distributed rank
    (operators/ranking.py) anyway — a web-scale corpus can push the
    vocab past single-task comfort too."""
    d = load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    from ..operators.dedup import _widen
    from ..operators.ranking import distributed_row_number

    counts = (
        _widen(d)
        .select(F.explode(T.norm_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n_occurrences"))
    )
    return distributed_row_number(
        counts, [F.col("n_occurrences").desc(), F.col("term")], rn_col="__rn"
    ).select(
        "term", "n_occurrences", (F.col("__rn") - 1).cast("int").alias("term_id")
    )


@register(
    "bigram_next_word_top3",
    oracle="""
    WITH t AS (
      SELECT list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '') AS toks
      FROM documents WHERE trim(text) <> ''
    ), grams AS (
      SELECT unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> toks[i] || ' ' || toks[i+1]
             )) AS bigram
      FROM t
    ), counts AS (
      SELECT split_part(bigram, ' ', 1) AS w1,
             split_part(bigram, ' ', 2) AS w2,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM grams GROUP BY 1, 2
    )
    SELECT w1, w2, n_pairs, rank FROM (
      SELECT w1, w2, n_pairs,
             CAST(ROW_NUMBER() OVER (PARTITION BY w1
                                     ORDER BY n_pairs DESC, w2) AS INT) AS rank
      FROM counts
    ) WHERE rank <= 3
    """,
)
def bigram_next_word_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-word table: for every leading word, its top-3
    successors by corpus bigram count — the backbone statistic of an
    n-gram language model (P(w2|w1) numerators) and a quick data-quality
    lens (degenerate corpora have near-deterministic successors). Bigram
    build is the doc_bigram_counts kernel, but kept as (w1, w2) STRUCT
    pairs end to end — no concat-then-split round trip through a string
    per bigram INSTANCE (the aggregate shrinks instances to distinct
    pairs, so any per-instance string work multiplies by corpus size).
    zip_with over two shifted slices of a one-time token projection
    tokenizes each document exactly once; the ranking window partitions
    by w1 over the aggregated pair table, so parallelism is vocab-wide
    and per-partition state is each word's successor list, not the
    corpus."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    t = d.select(T.norm_tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    )
    counts = (
        t.select(F.explode(pairs).alias("bg"))
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pairs"))
    )
    w = Window.partitionBy("w1").orderBy(F.col("n_pairs").desc(), "w2")
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 3)
    )


_FH_BUCKETS = 64


@register(
    "doc_feature_hashing",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS tok
      FROM documents WHERE trim(text) <> ''
    ), b AS (
      SELECT doc_id, CAST({_code_sql("tok")} % {_FH_BUCKETS} AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY 1, 2
    )
    SELECT doc_id,
           array_to_string(list_transform(list(bucket ORDER BY bucket),
                                          x -> CAST(x AS VARCHAR)), ',')
             AS buckets,
           array_to_string(list_transform(list(c ORDER BY bucket),
                                          x -> CAST(x AS VARCHAR)), ',')
             AS counts
    FROM b GROUP BY doc_id
    """,
)
def doc_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick: each document as a sparse 64-bucket hashed
    bag-of-words — (sorted bucket ids, aligned counts) parallel arrays,
    the fixed-width featurization that needs NO vocabulary pass (and
    therefore no global state) no matter the corpus size. Bucket =
    md5-derived integer mod 64, portable across engines via the
    rolling-fingerprint code helper. explode -> two hash aggregates,
    both keyed by doc_id: the second's state is bounded by the bucket
    count, and sparse output keeps row width at distinct-buckets, not
    table width."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    code = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    b = (
        d.select("doc_id", F.explode(T.norm_tokens(F.col("text"))).alias("tok"))
        .select("doc_id", (code % _FH_BUCKETS).cast("int").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("c"))
    )
    # parallel arrays emitted as CSV strings for driver hashability;
    # struct-sort keeps buckets/counts aligned before the join
    pairs = F.array_sort(F.collect_list(F.struct("bucket", "c")))
    return b.groupBy("doc_id").agg(
        F.array_join(
            F.transform(pairs, lambda s: s.bucket.cast("string")), ","
        ).alias("buckets"),
        F.array_join(
            F.transform(pairs, lambda s: s.c.cast("string")), ","
        ).alias("counts"),
    )


# --- distributed BPE merge training ----------------------------------------

_BPE_MERGE_ROUNDS = 3


def _bpe_cte_chain(rounds: int) -> str:
    """Loop-unrolled DuckDB twin of operators/bpe.py::_train — generated
    from the same round count so the two sides cannot drift (the
    pagerank-oracle pattern). Each round is three CTEs: weighted pair
    counts, the deterministic argmax, and the merge application via the
    identical '|sym||sym|' string-replace trick. The chain ends with
    t1..tN (per-round argmax rows), vN (the final vocabulary), and tokd
    (the doc_id-carrying filtered token stream)."""
    parts = [
        """
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS w
      FROM documents WHERE trim(text) <> ''
    ),
    tokd AS (
      SELECT doc_id, w FROM tok WHERE w <> '' AND NOT contains(w, '|')
    ),
    v0 AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
             list_transform(generate_series(1, length(w)),
                            i -> substring(w, i, 1)) AS seq
      FROM tokd GROUP BY w
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(f""",
    p{r} AS (
      SELECT pr.l AS lhs, pr.r AS rhs, CAST(SUM(cnt) AS BIGINT) AS pair_count
      FROM (
        SELECT cnt, unnest(list_transform(generate_series(1, len(seq) - 1),
                 i -> struct_pack(l := seq[i], r := seq[i + 1]))) AS pr
        FROM v{r - 1} WHERE len(seq) >= 2
      ) GROUP BY 1, 2
    ),
    t{r} AS (SELECT * FROM p{r} ORDER BY pair_count DESC, lhs, rhs LIMIT 1),
    v{r} AS (
      SELECT w, cnt,
             string_split(substring(s2, 2, length(s2) - 2), '||') AS seq
      FROM (
        SELECT w, cnt,
               replace('|' || array_to_string(seq, '||') || '|',
                       '|' || t.lhs || '||' || t.rhs || '|',
                       '|' || t.lhs || t.rhs || '|') AS s2
        FROM v{r - 1} CROSS JOIN t{r} t
      )
    )""")
    return "WITH " + "".join(parts)


def _bpe_merges_oracle(rounds: int) -> str:
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS rnd, lhs, rhs, lhs || rhs AS merged,"
        f" pair_count FROM t{r}"
        for r in range(1, rounds + 1)
    )
    return _bpe_cte_chain(rounds) + f" SELECT * FROM ({selects}) ORDER BY rnd"


def _bpe_segment_oracle(rounds: int) -> str:
    return _bpe_cte_chain(rounds) + f"""
    SELECT tokd.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(len(seq)) AS BIGINT) AS n_symbols,
           CAST(SUM(length(w)) AS BIGINT) AS n_chars,
           (CAST(SUM(len(seq)) AS DOUBLE) / CAST(SUM(length(w)) AS DOUBLE))
             AS symbols_per_char
    FROM tokd JOIN v{rounds} USING (w)
    GROUP BY tokd.doc_id
    """


def _bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    return d.select(
        "doc_id", F.explode(T.norm_tokens(F.col("text"))).alias("w")
    ).filter((F.col("w") != "") & (~F.col("w").contains("|")))


def _bpe_trained(spark: SparkSession, sf_dir: str):
    """Session-memoized (per-round argmax relations, final vocabulary):
    the training loop's eager localCheckpoints materialize once and both
    BPE catalog queries reuse them."""
    from ..operators import bpe as B

    def build():
        vocab = (
            _bpe_tokens(spark, sf_dir)
            .groupBy("w")
            .agg(F.count("*").cast("bigint").alias("cnt"))
            .withColumn("seq", B.chars(F.col("w")))
        )
        return B._train(vocab, _BPE_MERGE_ROUNDS)

    return C.memo(spark, "textops.bpe_trained", sf_dir, build)


@register("bpe_train_merges", oracle=_bpe_merges_oracle(_BPE_MERGE_ROUNDS))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py): learn the
    first 3 merge rules over the corpus in map-reduce form. The corpus
    contributes ONE word-count aggregation; every training round then
    runs over the VOCABULARY relation (bounded by distinct words, not
    corpus size — how production BPE trainers scale to 100 TB): one
    weighted pair-count aggregate, one TakeOrdered(1) argmax with a
    full tie-break, one broadcast merge application. The oracle unrolls
    the identical three rounds in SQL (the pagerank pattern), so the
    learned merge table is hash-checked end to end. The trained state
    is session-memoized and shared with bpe_segment_stats."""
    from ..operators import bpe as B

    tops, _ = _bpe_trained(spark, sf_dir)
    return B.merges_table(tops)


@register("bpe_segment_stats", oracle=_bpe_segment_oracle(_BPE_MERGE_ROUNDS))
def bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge table back to the corpus: per-doc
    token / symbol / character counts and the symbols-per-char
    compression ratio — the readout a tokenizer-training run reports
    before committing a vocabulary. Plan: the trained vocabulary
    (bounded by distinct words) joins the exploded token stream on the
    word — one equi-join + one per-doc aggregate; at 100 TB the
    segmenter table broadcasts (vocab-sized) and the corpus never
    reshuffles. Reuses the session-memoized trained vocabulary."""
    tokd = _bpe_tokens(spark, sf_dir)
    _, final_vocab = _bpe_trained(spark, sf_dir)
    seg = final_vocab.select("w", F.size("seq").alias("n_sym"))
    return (
        tokd.join(seg, "w")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum("n_sym").cast("bigint").alias("n_symbols"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
            (
                F.sum("n_sym").cast("double")
                / F.sum(F.length("w")).cast("double")
            ).alias("symbols_per_char"),
        )
    )


# GPT-style pretokenizer classes: letter runs, single digits, punctuation.
# The Spark side keeps Java's \s; the SQL twin spells the class out
# ([ \t\n\x0b\f\r]) because RE2's \s lacks VT (0x0B) — under the plain
# pattern a vertical tab counted as a punctuation "token" in DuckDB only
# (round-9 text-edge pin).
_BPE_PAT = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"
_BPE_PAT_SQL = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 \\t\\n\\x0b\\f\\r]"


@register(
    "doc_bpe_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST({_NTOK} AS BIGINT) AS n_ws_tokens,
           (CAST(len(regexp_extract_all(text, '{_BPE_PAT_SQL}')) AS DOUBLE)
             / CAST(greatest({_NTOK}, 1) AS DOUBLE)) AS expansion_ratio
    FROM documents
    """,
)
def doc_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: a GPT-style pretokenizer regex (letter
    runs | single digits | punctuation) bounds the subword token count
    from below the way real BPE vocabularies segment, next to the
    whitespace count and the expansion ratio — the cost estimator a
    training pipeline runs before committing a corpus to tokenization.
    One regexp_extract_all per row (same RE2/Java semantics for this
    pattern class), no shuffle; at 100 TB this is scan-bound."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    n_bpe = F.size(F.regexp_extract_all(t, F.lit(_BPE_PAT), 0)).cast("bigint")
    n_ws = T.token_count(t)
    return d.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        n_ws.alias("n_ws_tokens"),
        (
            n_bpe.cast("double") / F.greatest(n_ws, F.lit(1)).cast("double")
        ).alias("expansion_ratio"),
    )


_BOILER_N = 8  # window width in tokens
_BOILER_DF = 2  # doc-frequency threshold: window is boilerplate if >= DF docs


@register(
    "doc_boilerplate_ngrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '') AS toks
      FROM documents WHERE trim(text) <> ''
    ), w AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - {_BOILER_N - 1}, 0)),
               i -> array_to_string(toks[i:i+{_BOILER_N - 1}], ' ')
             )) AS w8
      FROM t
    ), dfq AS (
      SELECT w8, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM w GROUP BY w8
    )
    SELECT w.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN dfq.df >= {_BOILER_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boilerplate,
           (CAST(SUM(CASE WHEN dfq.df >= {_BOILER_DF} THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS boilerplate_frac
    FROM w JOIN dfq USING (w8)
    GROUP BY w.doc_id
    """,
)
def doc_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4/RefinedWeb-style boilerplate detection adapted to unpunctuated
    text: the fraction of each document's sliding 8-token windows that
    also appear in other documents (window doc-frequency >= 2) — the
    cross-document repeated-span signal behind header/footer stripping
    and exact-substring decontamination. Build = one window explode
    (shared-span relation persisted: it feeds both the doc-frequency
    aggregate and the per-doc probe), one distinct + hash aggregate for
    doc frequencies, one equi-join back. At 100 TB the window relation
    shuffles once on the window hash; df state is one counter per
    distinct window (bounded by corpus vocabulary of spans), and the
    probe join is the same shuffle key — co-partitioned, no extra
    pass. Docs shorter than 8 tokens emit no windows (absent rows, both
    engines)."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    t = d.select("doc_id", T.norm_tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    w8 = F.when(
        F.size(toks) >= _BOILER_N,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - _BOILER_N),
            lambda i: F.array_join(F.slice(toks, i + 1, _BOILER_N), " "),
        ),
    )
    w = C.ephemeral(t.select("doc_id", F.explode(w8).alias("w8")))
    dfq = w.distinct().groupBy("w8").agg(F.count("*").alias("df"))
    boiler = F.when(F.col("df") >= _BOILER_DF, 1).otherwise(0)
    return (
        w.join(dfq, "w8")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_windows"),
            F.sum(boiler).cast("bigint").alias("n_boilerplate"),
            (
                F.sum(boiler).cast("double") / F.count("*").cast("double")
            ).alias("boilerplate_frac"),
        )
    )


_OOV_VOCAB = 20


@register(
    "doc_oov_rate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS term
      FROM documents WHERE trim(text) <> ''
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS c FROM toks GROUP BY term
        ORDER BY c DESC, term LIMIT {_OOV_VOCAB}
      )
    )
    SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON v.term = t.term
    GROUP BY t.doc_id
    ORDER BY t.doc_id
    """,
)
def doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus top-K
    frequency vocabulary (K=20 — small against the fixture's tiny
    synthetic lexicon so the rate is non-degenerate; a production run
    uses 32k-256k) — the tokenizer-coverage metric a training pipeline
    tracks per source before committing a tokenizer. Plan: one
    explode+count builds the vocab (TakeOrdered K with (count, term)
    tiebreak — deterministic), which then BROADCASTS into a left join
    against the token stream; per-doc aggregate with map-side combine.
    The vocab is top-K-bounded, so the broadcast is safe at any corpus
    size — the classic small-dim join. Exact-integer ratio -> double."""
    from ..operators.dedup import _widen

    d = load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    toks = _widen(d).select(
        "doc_id", F.explode(T.norm_tokens(F.col("text"))).alias("term")
    )
    vocab = (
        toks.groupBy("term")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), "term")
        .limit(_OOV_VOCAB)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast(
                    "double"
                )
                / F.count("*").cast("double")
            ).alias("oov_rate"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_span_corruption",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    b AS (
      SELECT doc_id, toks, len(toks) AS n,
             CAST(ceil(len(toks) / 4.0) AS INT) AS nb
      FROM t
    ),
    m AS (
      SELECT doc_id, toks, n, nb,
             list_transform(generate_series(1, nb),
               i -> CASE WHEN 4*(i-1) + 3 <= n
                          AND strpos('0123',
                                substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                              || CAST(i-1 AS VARCHAR)), 1, 1)) > 0
                    THEN 1 ELSE 0 END) AS mf
      FROM b
    )
    SELECT doc_id,
      -- COALESCE: DuckDB array_to_string([]) is NULL where Spark
      -- array_join([]) is '' (a zero-token doc has zero blocks)
      COALESCE(array_to_string(list_transform(generate_series(1, nb),
        i -> CASE WHEN mf[i] = 1
          THEN '<X_' || CAST(list_sum(list_slice(mf, 1, i)) AS VARCHAR) || '>'
               || CASE WHEN 4*(i-1)+4 <= n
                       THEN ' ' || toks[4*(i-1)+4] ELSE '' END
          ELSE array_to_string(
                 list_slice(toks, 4*(i-1)+1, least(4*(i-1)+4, n)), ' ')
        END), ' '), '') AS input_text,
      COALESCE(array_to_string(list_filter(list_transform(generate_series(1, nb),
        i -> CASE WHEN mf[i] = 1
          THEN '<X_' || CAST(list_sum(list_slice(mf, 1, i)) AS VARCHAR) || '>'
               || ' ' || array_to_string(
                           list_slice(toks, 4*(i-1)+1, 4*(i-1)+3), ' ')
          ELSE '' END), x -> x <> ''), ' '), '') AS target_text,
      CAST(COALESCE(list_sum(mf), 0) AS BIGINT) AS n_masked_spans
    FROM m
    ORDER BY doc_id
    """,
)
def doc_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style span corruption, fully deterministic: the corpus is
    tokenized, partitioned into stride-4 blocks, and each complete
    block's first 3 tokens are masked with probability 1/4 decided by a
    HASH (first md5 hex digit of doc_id:block in '0123'), never an RNG —
    so the (input, target) pair for a given doc is reproducible across
    runs, engines, and cluster layouts, which is exactly what a
    training-data pipeline needs for resumable preprocessing. Masked
    spans become <X_k> sentinels in the input (k = 1-based masked-span
    ordinal via an in-array prefix sum — no window, no shuffle); the
    target pairs each sentinel with the tokens it removed. The whole
    operator is per-row JVM array expressions inside whole-stage
    codegen: ZERO shuffles, zero Python, embarrassingly parallel at any
    scale. The stride-4 grid guarantees spans can't overlap without any
    sequential dependence between mask decisions."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    df = (
        d.select("doc_id", T.norm_tokens(F.col("text")).alias("toks"))
        .withColumn("n", F.size("toks"))
        .withColumn("nb", F.ceil(F.col("n") / F.lit(4.0)).cast("int"))
    )
    n = F.col("n")
    toks = F.col("toks")

    # nb = 0 (a doc whose normalized tokens are empty — e.g. whitespace-
    # only-but-not-space text, which survives the trim guard): Spark's
    # sequence(1, 0) DESCENDS by default ([1, 0]) and element_at(mf, 0)
    # raises under ANSI; DuckDB's generate_series(1, 0) is empty. Same
    # guard class as operators/dedup.py::shingles.
    def _blocks():
        return F.when(
            F.col("nb") >= 1, F.sequence(F.lit(1), F.col("nb"))
        ).otherwise(F.array().cast("array<int>"))

    mf_expr = F.transform(
        _blocks(),
        lambda i: F.when(
            ((i - 1) * 4 + 3 <= n)
            & F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        (i - 1).cast("string"),
                    )
                ),
                1,
                1,
            ).isin("0", "1", "2", "3"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    df = df.withColumn("mf", mf_expr)
    mf = F.col("mf")

    def k_of(i):
        return F.aggregate(F.slice(mf, F.lit(1), i), F.lit(0), lambda a, v: a + v)

    def input_piece(i):
        start = (i - 1) * 4 + 1
        return F.when(
            F.element_at(mf, i) == 1,
            F.concat(
                F.lit("<X_"),
                k_of(i).cast("string"),
                F.lit(">"),
                F.when(
                    start + 3 <= n,
                    F.concat(F.lit(" "), F.element_at(toks, start + 3)),
                ).otherwise(F.lit("")),
            ),
        ).otherwise(
            F.array_join(F.slice(toks, start, F.least(F.lit(4), n - start + 1)), " ")
        )

    def target_piece(i):
        start = (i - 1) * 4 + 1
        return F.when(
            F.element_at(mf, i) == 1,
            F.concat(
                F.lit("<X_"),
                k_of(i).cast("string"),
                F.lit("> "),
                F.array_join(F.slice(toks, start, F.lit(3)), " "),
            ),
        ).otherwise(F.lit(""))

    seq = _blocks()
    return df.select(
        "doc_id",
        F.array_join(F.transform(seq, input_piece), " ").alias("input_text"),
        F.array_join(
            F.filter(F.transform(seq, target_piece), lambda x: x != ""), " "
        ).alias("target_text"),
        F.aggregate(mf, F.lit(0), lambda a, v: a + v)
        .cast("bigint")
        .alias("n_masked_spans"),
    ).orderBy("doc_id")


@register(
    "doc_quality_pct_rank_by_source",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source,
             (0.4 * {_STOPRATIO}
            + 0.3 * least({_AVGLEN} / 10.0, 1.0)
            + 0.3 * {_ALPHA}) AS q
      FROM documents
    )
    SELECT doc_id, source, q,
           CASE WHEN COUNT(*) OVER (PARTITION BY source) = 1 THEN 0.0
                ELSE CAST(ROW_NUMBER() OVER (
                       PARTITION BY source ORDER BY q, doc_id) - 1 AS DOUBLE)
                     / CAST(COUNT(*) OVER (PARTITION BY source) - 1 AS DOUBLE)
           END AS pct_rank
    FROM q
    ORDER BY doc_id
    """,
)
def doc_quality_pct_rank_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-rank normalization of quality scores WITHIN each source
    — the cross-source calibration step before corpus mixing (raw
    quality scores aren't comparable across a web crawl and a curated
    source; their within-source percentile is). Same scale trap as the
    grouped median: a handful of sources means PARTITION BY source is a
    near-global window. Same cure: ONE composite-key (source, q,
    doc_id) two-pass distributed rank, then a per-source 4-row
    aggregate broadcast back converts global rank to within-source
    (rank-1)/(n-1). The per-row double q is engine-identical, so the
    composite ordering (tiebreak doc_id) is total; the percentile is
    an exact-integer ratio."""
    from ..catalog import load as _load
    from ..functions.text import quality_score
    from ..operators.ranking import distributed_row_number

    d = _load(spark, sf_dir, "documents").select(
        "doc_id", "source", quality_score(F.col("text")).alias("q")
    )
    ranked = distributed_row_number(
        d, [F.col("source"), F.col("q"), F.col("doc_id")], rn_col="grn"
    )
    per_src = ranked.groupBy("source").agg(
        F.min("grn").alias("src_start"), F.count("*").alias("src_n")
    )
    return (
        ranked.join(F.broadcast(per_src), "source")
        .select(
            "doc_id",
            "source",
            "q",
            F.when(F.col("src_n") == 1, F.lit(0.0))
            .otherwise(
                (F.col("grn") - F.col("src_start")).cast("double")
                / (F.col("src_n") - 1).cast("double")
            )
            .alias("pct_rank"),
        )
        .orderBy("doc_id")
    )


# SON support threshold: term is "frequent" iff 50*count >= total
# tokens (support >= 2%) — integer-exact on both sides
_SON_DEN = 50


@register(
    "frequent_terms_son",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '')) AS term
      FROM documents
    ),
    tok2 AS (SELECT term FROM tok WHERE term <> ''),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok2),
    c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS n FROM tok2 GROUP BY term)
    SELECT term, n,
           CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
    FROM c CROSS JOIN t
    WHERE {_SON_DEN} * n >= total
    ORDER BY n DESC, term
    """,
)
def frequent_terms_son(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent terms (support >= 1/50 of all tokens) via the SON
    two-phase algorithm: phase 1 keeps, per partition, only terms whose
    LOCAL share clears the same threshold — by pigeonhole a globally
    frequent term must be locally frequent in at least one partition,
    for ANY partitioning, so the candidate union is a provable superset
    — and phase 2 recounts only the candidates exactly. At 100 TB with
    a web-scale vocabulary this is the move that matters: the full
    term aggregate would shuffle billions of distinct rare terms;
    phase 2's shuffle carries candidate terms only (the broadcast
    semi-join prunes map-side). The final integer filter makes the
    output exact and partitioning-independent; the oracle is the plain
    one-pass GROUP BY...HAVING. Threshold compares use 50*n >= total —
    all-integer, no float support ratio."""
    from ..functions.text import norm_tokens
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents"))
    tok = d.select(F.explode(norm_tokens(F.col("text"))).alias("term")).filter(
        F.col("term") != ""
    )
    # ln and lt MUST come from ONE lineage: joining two independently
    # recomputed aggregates keyed on spark_partition_id() would divide
    # one partitioning's local count by another's total if the
    # round-robin exchange is ever re-executed with a different row
    # assignment — silently breaking the pigeonhole superset. A window
    # sum per pid over the single aggregate keeps the plan a tree
    # (pid-partitioned window, ~shuffle-width partitions — never the
    # single-partition trap).
    part = tok.withColumn("pid", F.spark_partition_id())
    local = part.groupBy("pid", "term").agg(F.count("*").alias("ln"))
    wp = Window.partitionBy("pid")
    cands = (
        local.withColumn("lt", F.sum("ln").over(wp))
        .filter(_SON_DEN * F.col("ln") >= F.col("lt"))
        .select("term")
        .distinct()
    )
    counts = (
        tok.join(F.broadcast(cands), "term")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    total = tok.agg(F.count("*").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(_SON_DEN * F.col("n") >= F.col("total"))
        .select(
            "term",
            "n",
            (F.col("n").cast("double") / F.col("total").cast("double")).alias(
                "share"
            ),
        )
        .orderBy(F.col("n").desc(), "term")
    )


# classifier-evaluation ops: reuse the registered member plans' oracle
# text as derived tables (the ann_eval pattern) so the evaluation can
# never drift from the thing it evaluates
from ..catalog import REGISTRY as _TREG


@register(
    "eval_lang_id_confusion",
    oracle=f"""
    WITH pred AS (SELECT * FROM ({_TREG["doc_lang_id"].oracle})),
    joined AS (
      SELECT d.lang AS true_lang, p.lang_pred
      FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    ),
    cell AS (
      SELECT true_lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM joined GROUP BY true_lang, lang_pred
    ),
    tot AS (
      SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true
      FROM cell GROUP BY true_lang
    )
    SELECT c.true_lang, c.lang_pred, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS frac_of_true
    FROM cell c JOIN tot t ON t.true_lang = c.true_lang
    ORDER BY c.true_lang, c.lang_pred
    """,
)
def eval_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the stopword-argmax language classifier
    against the corpus's labeled `lang` column — the per-class
    evaluation every heuristic filter needs before it gates data at
    scale (e.g. zh has no stopword table here, so the matrix shows
    exactly where its documents land). Reuses doc_lang_id's registered
    plan AND its oracle text verbatim, joined back to ground truth; two
    tiny keyed aggregates, exact-integer counts, one IEEE divide for
    the per-true-class fraction."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("true_lang")
    )
    pred = doc_lang_id(spark, sf_dir)
    cell = (
        d.join(pred, "doc_id")
        .groupBy("true_lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )
    wt = cell.groupBy("true_lang").agg(F.sum("n").alias("n_true"))
    return (
        cell.join(F.broadcast(wt), "true_lang")
        .select(
            "true_lang",
            "lang_pred",
            "n",
            (F.col("n").cast("double") / F.col("n_true").cast("double")).alias(
                "frac_of_true"
            ),
        )
        .orderBy("true_lang", "lang_pred")
    )


from ..catalog import dsum_sql as _dsum_sql_fn

_dsum_sql_p = _dsum_sql_fn("p")


@register(
    "doc_lm_transition_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split(replace(translate(lower(trim(regexp_replace(text, '[ \\t\\n\\x0b\\f\\r]+', ' ', 'g'))), 'ς', 'σ'), 'i' || chr(775), 'i'), ' '), t -> t <> '') AS toks
      FROM documents WHERE trim(text) <> ''
    ),
    inst AS (
      SELECT doc_id,
             unnest(list_transform(
               generate_series(1, greatest(len(toks) - 1, 0)),
               i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])
             )) AS bg
      FROM t
    ),
    cp AS (
      SELECT bg.w1 AS w1, bg.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS np
      FROM inst GROUP BY 1, 2
    ),
    cw AS (SELECT w1, CAST(SUM(np) AS BIGINT) AS nw FROM cp GROUP BY w1),
    scored AS (
      SELECT i.doc_id,
             CAST(cp.np AS DOUBLE) / CAST(cw.nw AS DOUBLE) AS p
      FROM inst i
      JOIN cp ON cp.w1 = i.bg.w1 AND cp.w2 = i.bg.w2
      JOIN cw ON cw.w1 = i.bg.w1
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ({_dsum_sql_p} / COUNT(*)) AS mean_transition_prob
    FROM scored GROUP BY doc_id
    """,
)
def doc_lm_transition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model scoring of every document against the
    corpus-wide model: mean P(w_i | w_(i-1)) over the doc's transitions,
    with P = corpus bigram count / corpus first-word count. This is the
    perplexity-proxy quality signal a data pipeline uses to find
    machine-generated or shuffled text (true perplexity needs log() —
    not bit-portable across engines, catalog.py rules — and the linear
    mean ranks documents the same way for filtering). The probability
    sum rides the decimal discipline (order-independent); the model
    tables are vocab-sized, so the instance joins broadcast at any
    corpus scale."""
    from ..operators.dedup import _widen

    d = _widen(load(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != ""))
    toks = T.norm_tokens(F.col("text"))
    grams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    inst = d.select("doc_id", F.explode(grams).alias("bg")).select(
        "doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
    )
    cp = inst.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("np"))
    cw = cp.groupBy("w1").agg(F.sum("np").cast("bigint").alias("nw"))
    scored = (
        inst.join(cp, ["w1", "w2"])
        .join(cw, "w1")
        .select(
            "doc_id",
            (F.col("np").cast("double") / F.col("nw").cast("double")).alias("p"),
        )
    )
    from ..catalog import dsum

    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        (dsum(F.col("p")) / F.count("*")).alias("mean_transition_prob"),
    )


def _quality_lm_corr_oracle() -> str:
    from ..catalog import REGISTRY as _R

    return f"""
    WITH q AS (SELECT doc_id, quality_score FROM ({_R["doc_quality_scores"].oracle})),
    lm AS (SELECT doc_id, mean_transition_prob
           FROM ({_R["doc_lm_transition_score"].oracle})),
    j AS (
      SELECT CAST(floor(q.quality_score * 1000000.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(lm.mean_transition_prob * 1000000.0 + 0.5) AS BIGINT) AS y
      FROM q JOIN lm ON lm.doc_id = q.doc_id
    ),
    m AS (
      SELECT CAST(COUNT(*) AS HUGEINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sx2,
             SUM(CAST(y AS HUGEINT) * y) AS sy2
      FROM j
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           (CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
            / (sqrt(CAST(CAST(n * sx2 - sx * sx AS VARCHAR) AS DOUBLE))
               * sqrt(CAST(CAST(n * sy2 - sy * sy AS VARCHAR) AS DOUBLE))))
             AS corr_quality_lm
    FROM m
    """


@register("eval_quality_vs_lm_corr", oracle=_quality_lm_corr_oracle())
def eval_quality_vs_lm_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do the two independent quality signals agree? Pearson correlation
    between the heuristic quality score (stopword/alpha/length mix) and
    the bigram-LM transition score, per corpus — the calibration check
    a filtering pipeline runs before trusting either signal to gate
    data. ALL-INTEGER (the KS/Gini pattern): both scores quantize to
    exact 1e-6 ticks (floor(x*1e6+0.5) — identical doubles floor
    identically), every moment and cross-product runs in exact WIDE
    integer arithmetic — DECIMAL(38,0) here, HUGEINT in the oracle —
    because the normal-equation products (n*sxy, sx*sy) scale as n^2
    x 1e12 and blow through int64 once the corpus passes ~5e6 docs
    (the same sf0.1 overflow class the round-6 gate caught in
    trend_theilsen). The exact differences convert through VARCHAR to
    double, so only the final sqrt/divide touches floats —
    sidestepping the decimal-cast half-tie hazard that ratio-valued
    inputs (exact k/n probabilities) would otherwise hit. Docs with no
    bigrams drop out of both sides identically."""
    q = doc_quality_scores(spark, sf_dir).select("doc_id", "quality_score")
    lm = doc_lm_transition_score(spark, sf_dir).select(
        "doc_id", "mean_transition_prob"
    )
    j = q.join(lm, "doc_id").select(
        F.floor(F.col("quality_score") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("x"),
        F.floor(F.col("mean_transition_prob") * 1000000.0 + 0.5)
        .cast("bigint")
        .alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    wide = "decimal(38,0)"  # x*y fits int64 per row; the SUMS and the
    # n*sxy / sx*sy cross-products do NOT once n passes ~5e6 docs
    m = j.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(x.cast(wide)).alias("sx"),
        F.sum(y.cast(wide)).alias("sy"),
        F.sum((x * y).cast(wide)).alias("sxy"),
        F.sum((x * x).cast(wide)).alias("sx2"),
        F.sum((y * y).cast(wide)).alias("sy2"),
    )
    n, sx, sy, sxy, sx2, sy2 = (
        F.col(c) for c in ["n", "sx", "sy", "sxy", "sx2", "sy2"]
    )
    nw = n.cast(wide)
    d = lambda c: c.cast("string").cast("double")  # noqa: E731 — exact
    # decimal -> string -> correctly-rounded double, both engines
    return m.select(
        n.alias("n_docs"),
        # try_divide: a constant-score or single-doc corpus zeroes the
        # denominator — DuckDB float /0 is NULL, ANSI Spark raises
        # (round-8 edge probe)
        F.try_divide(
            d(nw * sxy - sx * sy),
            F.sqrt(d(nw * sx2 - sx * sx)) * F.sqrt(d(nw * sy2 - sy * sy)),
        ).alias("corr_quality_lm"),
    )
