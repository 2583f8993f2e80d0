"""Distributed BPE merge training — the tokenizer-training loop a
pretraining stack runs before anything else, in its map-reduce form:
state is the WORD-COUNT relation (bounded by corpus vocabulary, not
corpus size), each round is one pair-count aggregate + one TakeOrdered
argmax + one broadcast merge application. At 100 TB the corpus
contributes only the initial word-count aggregation; every training
round then runs over the vocabulary relation — exactly how production
BPE trainers scale (count words once, train on the dictionary).

All JVM expressions; the merge application rides string ``replace``:
the symbol sequence round-trips through a '|sym1||sym2|' wrapped
string, and replace's left-to-right non-overlapping scan (identical in
Spark and DuckDB) IS greedy within-round BPE semantics — in 'aaaa' the
merge (a,a) yields 'aa','aa'. (A struct-accumulator fold was the first
formulation; DuckDB 1.0's list_reduce silently drops list fields from
struct accumulators, so the set-based string form is also the only
oracle-safe one.) Tokens containing the '|' delimiter are excluded
identically on both sides — absent from the fixtures, a real corpus
would swap in an unprintable delimiter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chars(word: Column) -> Column:
    """word -> array of single characters (the round-0 symbol seq)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substr(word, i, F.lit(1)),
    )


def apply_merge(seq: Column, lhs: Column, rhs: Column) -> Column:
    """One BPE merge pass over a symbol sequence: every adjacent
    (lhs, rhs) becomes lhs||rhs, greedy left-to-right, non-overlapping.
    The sequence is serialized as '|s1||s2||...|' and the merge is one
    literal string replace of '|lhs||rhs|' with '|lhs rhs|' — replace
    continues scanning AFTER each substitution, which is exactly the
    greedy non-overlap rule ('aaaa' + (a,a) -> 'aa','aa')."""
    s = F.concat(F.lit("|"), F.array_join(seq, "||"), F.lit("|"))
    pattern = F.concat(F.lit("|"), lhs, F.lit("||"), rhs, F.lit("|"))
    replacement = F.concat(F.lit("|"), lhs, rhs, F.lit("|"))
    s2 = F.replace(s, pattern, replacement)
    return F.split(F.substring(s2, 2, F.length(s2) - 2), r"\|\|")


def pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, pair_count) over a (w, cnt, seq) vocabulary
    relation — each word contributes cnt x its adjacent symbol pairs
    (overlapping positions count, standard BPE)."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("seq") - 1),
        lambda i: F.struct(
            F.element_at("seq", i).alias("l"),
            F.element_at("seq", i + 1).alias("r"),
        ),
    )
    return (
        vocab.filter(F.size("seq") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
        .agg(F.sum("cnt").cast("bigint").alias("pair_count"))
    )


_TOP_SCHEMA = "rnd int, lhs string, rhs string, pair_count bigint"


def _top_literal(spark, rnd: int, lhs: str, rhs: str, pair_count: int) -> DataFrame:
    """One collected argmax row as a JVM-side literal relation.
    range(1)+lit instead of createDataFrame: the parallelize path costs
    ~0.7 s per cold count for a 3-leg union (Python serialization + one
    RDD-scan job per leg — measured round 13); a projected range(1) is
    a constant-folded local scan."""
    return spark.range(0, 1, 1, 1).select(
        F.lit(rnd).cast("int").alias("rnd"),
        F.lit(lhs).alias("lhs"),
        F.lit(rhs).alias("rhs"),
        F.lit(pair_count).cast("bigint").alias("pair_count"),
    )


def _train(vocab: DataFrame, rounds: int) -> tuple[list[DataFrame], DataFrame]:
    """The shared training loop: per round one pair-count aggregate,
    one TakeOrdered(1) argmax with a full deterministic tie-break
    (count desc, lhs, rhs), one merge application over the checkpointed
    vocabulary. Each round's vocabulary is localCheckpoint-ed
    (iterative-lineage discipline, the kmeans / components pattern).
    Returns the per-round 1-row argmax relations and the final merged
    vocabulary.

    Round 13 (optimization guide §2/§5 — fewer driver actions, no
    re-execution): the argmax is COLLECTED once per round (one row) and
    applied as literals, instead of riding a broadcast crossJoin whose
    lazy ``top`` plan made every later consumer of the tops RE-RUN that
    round's full pair-count aggregate (merges_table re-executed all
    ``rounds`` aggregates at action time). The returned tops are now
    1-row LOCAL relations — same rows, same schema, zero recompute —
    and the per-round checkpoint job is a pure narrow map (no broadcast
    build stage). The argmax value itself is computed by the identical
    TakeOrdered plan with the identical tie-break, so the learned
    merges are bit-for-bit unchanged (oracle-pinned end to end)."""
    spark = vocab.sparkSession
    tops = []
    for rnd in range(1, rounds + 1):
        top_rows = (
            pair_counts(vocab)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if top_rows:
            r = top_rows[0]
            tops.append(
                _top_literal(spark, rnd, r["lhs"], r["rhs"], r["pair_count"])
            )
            vocab = vocab.select(
                "w",
                "cnt",
                apply_merge(
                    F.col("seq"), F.lit(r["lhs"]), F.lit(r["rhs"])
                ).alias("seq"),
            ).localCheckpoint(eager=True)
        else:
            # no adjacent pair anywhere (every word is a single symbol):
            # the previous broadcast-crossJoin formulation emptied the
            # vocabulary against the empty argmax — preserve that exact
            # semantic so degenerate corpora keep their pinned shape
            tops.append(spark.createDataFrame([], _TOP_SCHEMA))
            vocab = vocab.limit(0).localCheckpoint(eager=True)
    return tops, vocab


def merges_table(tops: list[DataFrame]) -> DataFrame:
    """Assemble the per-round argmax relations into the ordered
    (rnd, lhs, rhs, merged, pair_count) merge table."""
    out = tops[0]
    for t in tops[1:]:
        out = out.unionAll(t)
    return out.select(
        "rnd",
        "lhs",
        "rhs",
        F.concat("lhs", "rhs").alias("merged"),
        "pair_count",
    ).orderBy("rnd")


def train_merges(vocab: DataFrame, rounds: int) -> DataFrame:
    """``rounds`` BPE merges over a (w, cnt, seq) vocabulary relation.
    Returns (rnd, lhs, rhs, merged, pair_count) — one row per round,
    the learned merge table in order."""
    tops, _ = _train(vocab, rounds)
    return merges_table(tops)


def train_vocab(vocab: DataFrame, rounds: int) -> DataFrame:
    """The (w, cnt, seq) vocabulary AFTER ``rounds`` BPE merges — the
    segmenter table a pipeline joins against its token stream."""
    _, final = _train(vocab, rounds)
    return final
