"""Deduplication operators for training-data pipelines (north-star
extension): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-
cosine near-dup. All pure DataFrame compositions — explode/groupBy/
join — so every stage distributes and AQE handles skew.

Scale shapes (100 TB posture):
- exact: one hash-aggregate on the fingerprint (map-side combine).
- MinHash: explode(shingles) is the big intermediate — rows =
  total shingle count, but it reduces immediately into per-doc
  signatures (8 mins in ONE groupBy, no cross join with hash ids).
  Candidate generation joins on (band, bucket): only docs sharing a
  bucket ever meet, which is the entire point of LSH at scale.
- SimHash: 16-bit signatures; hamming<=3 pairs found via 4-bit band
  exact-match prefilter (pigeonhole: 3 flipped bits leave >=1 of 4
  bands intact) — again a bucket equi-join, not an all-pairs scan.
- embedding near-dup: brute pairwise within blocking keys (or the LSH
  buckets from operators/similarity.py) — the all-pairs form here is
  for oracle-checkable correctness at fixture scale.

The hash family is md5-based so the DuckDB oracles can reproduce it
byte-for-byte (Spark hash()/xxhash64 have no DuckDB twin); md5 is
JVM-side codegen, not a UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import norm_tokens
from . import cache

NUM_HASHES = 8
BANDS = 4  # rows-per-band = 2
SIMHASH_BITS = 16


def shingles(text, k: int = 3):
    """Distinct k-word shingles of the normalized text (array column).
    Documents shorter than k tokens yield an empty array — guarded
    explicitly: sequence(0, size-k) with size < k would produce a
    DESCENDING [0, -1, ...] (Spark defaults step to -1 when start >
    stop) and the element_at lookups then throw under ANSI. The parquet
    fixtures contain no sub-k docs, so this only ever fired on the
    round-7 pathological-corpus suite; the DuckDB oracle's
    generate_series(1, greatest(len-2, 0)) was always empty-safe."""
    toks = norm_tokens((text))
    idx = F.when(
        F.size(toks) >= k, F.sequence(F.lit(0), F.size(toks) - k)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(k)]
            ),
        )
    )


def _widen(df: DataFrame) -> DataFrame:
    """Repartition compact inputs before compute-heavy derivations.

    The fixtures are single parquet files -> one input partition, which
    serializes the expensive higher-order-function work onto one core
    (measured 4x wall-clock on shingling at sf0.1). On a real cluster
    the same situation arises whenever a small dimension feeds a heavy
    per-row derivation — widening to the cluster's parallelism is the
    standard fix and costs one tiny round-robin shuffle."""
    target = df.sparkSession.sparkContext.defaultParallelism * 2
    return df.repartition(target)


def shingle_rows(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                 k: int = 3) -> DataFrame:
    """(id, shingle) rows — the exploded form both MinHash and Jaccard use.

    Widened by HASH-partitioning on the id (not _widen's round-robin):
    the same single-core-explode fix, but HashPartitioning(id) also
    satisfies the clustered distribution of every downstream per-doc
    aggregation — minhash_signatures' groupBy(id) and jaccard_pairs'
    shingle-set sizes — so the signature pipeline runs with ONE shuffle
    (same round-5 move as the doc-vector family; min/count aggregates
    are order-free, so the result is bit-identical)."""
    target = docs.sparkSession.sparkContext.defaultParallelism * 2
    return docs.repartition(target, id_col).select(
        F.col(id_col).alias("id"), F.explode(shingles(F.col(text_col), k)).alias("sh")
    )


def minhash_signatures(sh_rows: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """Per-doc MinHash signature: sig_h = min(md5('h|' || shingle)).
    One groupBy computes all hash functions (no hash-id cross join)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}|"), F.col("sh")))).alias(f"sig{h}")
        for h in range(num_hashes)
    ]
    return sh_rows.groupBy("id").agg(*aggs)


def lsh_buckets(sigs: DataFrame, bands: int = BANDS,
                num_hashes: int = NUM_HASHES) -> DataFrame:
    """(id, band, bucket) rows: bucket = md5 of the band's signature rows."""
    rows_per_band = num_hashes // bands
    bucket_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat(
                        *[F.col(f"sig{b * rows_per_band + r}") for r in range(rows_per_band)]
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select("id", F.explode(bucket_structs).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Distinct (id1 < id2) pairs sharing at least one LSH bucket.

    The bucket relation is persisted before the self-join: both join
    sides read the SAME computed relation instead of replaying the
    whole shingle->signature->bucket pipeline twice (measured ~2x on
    the candidate stage). It's (id, band, bucket) rows — small at any
    corpus size relative to the text it derives from. Registered as an
    ephemeral cache entry (operators/cache.py) so the harness can
    release it once the consuming query has materialized."""
    buckets = cache.ephemeral(buckets)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )


def jaccard_pairs(sh_rows: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for the given candidate pairs.

    Deliberately NOT semi-join-pruned to candidate ids, re-confirmed
    round 7 AFTER the precondition changed: the round-5 loss was the
    prefilter recomputing an unpersisted candidate pipeline (4.7s ->
    9.1s); with candidates now a PERSISTED rep-grain family the prune
    was re-A/B'd and still loses — sf0.1 0.97s -> 2.49s, pathological
    10x 3.04s -> 4.25s, identical output — because the structural
    exact-dup collapse already removed the duplicate shingle volume the
    prune would have cut, and the distinct+semi overhead is all that
    remains. Revisit only if this ever runs over a MEMBER-grain shingle
    relation again."""
    sizes = sh_rows.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh_rows.alias("s1"), F.col("id1") == F.col("s1.id"))
        .join(
            sh_rows.alias("s2"),
            (F.col("id2") == F.col("s2.id")) & (F.col("s1.sh") == F.col("s2.sh")),
        )
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.alias("n1"), F.col("id1") == F.col("n1.id"))
        .join(sizes.alias("n2"), F.col("id2") == F.col("n2.id"))
        .select(
            "id1",
            "id2",
            (
                F.col("inter").cast("double")
                / (F.col("n1.n") + F.col("n2.n") - F.col("inter")).cast("double")
            ).alias("jaccard"),
        )
    )


def expand_rep_pairs(
    members: DataFrame, rep_pairs: DataFrame, payload: list[str]
) -> DataFrame:
    """Expand representative-level pairs back to ALL member-level pairs
    (round-7 structural exact-dup collapse): for every rep pair
    (id1 < id2, *payload), emit every cross pair of the two exact-dup
    groups as (least, greatest, *payload). Exact by construction:
    members of a group share the normalized text, hence behave
    identically in every hash family (shingles, MinHash, SimHash votes,
    hashed-tf vectors), so a rep-level pair qualifies iff every one of
    its member pairs does — and every payload value (jaccard, hamming,
    cosine) is computed from group-invariant inputs. Two equi-joins on
    the rep key; output size is the true pair count, which is the
    consumer's contract, but nothing quadratic is ever PERSISTED or
    self-joined at member grain."""
    m1 = members.select(F.col("rep").alias("id1"), F.col("id").alias("m1"))
    m2 = members.select(F.col("rep").alias("id2"), F.col("id").alias("m2"))
    return (
        rep_pairs.join(m1, "id1")
        .join(m2, "id2")
        .select(
            F.least("m1", "m2").alias("id1"),
            F.greatest("m1", "m2").alias("id2"),
            *payload,
        )
    )


def intra_group_pairs(
    members: DataFrame, qualified_reps: DataFrame
) -> DataFrame:
    """(id1 < id2) pairs WITHIN each exact-duplicate group whose rep
    appears in ``qualified_reps`` (the groups the hash family actually
    sees — e.g. reps with >= 1 shingle / >= 1 token / nonzero vector
    norm; a group of sub-shingle-length docs produces no signatures and
    therefore no raw pairs). Identical members always collide in every
    band (equal signatures), so every within-group pair is a raw
    candidate/near-pair by construction. One equi-join on the group
    key: per-group quadratic — the output's own size — never a
    corpus-level self-join."""
    g = members.join(
        qualified_reps.select(F.col("id").alias("rep")), "rep", "left_semi"
    )
    a = g.select("rep", F.col("id").alias("id1"))
    b = g.select("rep", F.col("id").alias("id2"))
    return (
        a.join(b, "rep")
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
    )


def connected_components(
    edges: DataFrame, a_col: str = "id1", b_col: str = "id2", max_iters: int = 20
) -> DataFrame:
    """Connected components of an undirected pair graph via iterative
    min-label propagation: every node starts labeled with its own id;
    each round takes the min of its label and its neighbors' labels.
    Converges in <= graph-diameter rounds (near-dup clusters are
    shallow — a handful of rounds in practice), with a ``max_iters``
    backstop. Returns (id, component) where component = min node id
    reachable — the canonical "keeper" per duplicate cluster.

    Scale shape: each round is one equi-join on node id + one groupBy
    min — both shuffle on the same key, so at 100 TB this is
    diameter x (2 shuffles) over the EDGE set only (nodes not in any
    pair never enter). The edge relation is persisted once; labels are
    localCheckpoint-ed per round to stop iterative-lineage replay.
    The convergence probe is an aggregate count, not a collect."""
    # materialize the edge relation ONCE before anything fans out: it
    # feeds both branches of the direction-union and every propagation
    # round, and its lineage (an LSH+verify pipeline, typically) is the
    # expensive part — measured 11s -> 4.6s at sf0.1 for the jaccard
    # graph when the double-compute was removed
    edges = edges.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).localCheckpoint(eager=True)
    # partition the iteration proportionally to the ACTUAL edge count:
    # duplicate graphs are usually tiny relative to the corpus, and
    # pushing a few hundred edges through 32-partition shuffles makes
    # every round pure scheduling overhead. ~50k edges per partition,
    # capped at the session parallelism.
    n_edges = edges.count()
    parts = max(1, min(edges.sparkSession.sparkContext.defaultParallelism,
                       n_edges // 50_000 + 1))
    und = (
        edges.union(edges.select(F.col("dst"), F.col("src")))
        .distinct()
        .repartition(parts, "src")
        .persist()
    )
    labels = (
        und.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iters):
        nbr_min = (
            und.join(labels, und["src"] == labels["id"])
            .groupBy(F.col("dst").alias("nid"))
            .agg(F.min("label").alias("nbr_label"))
        )
        # carry the previous label through the checkpoint so convergence
        # is a filter over the materialized table, not another join job
        new_labels = (
            labels.join(nbr_min, labels["id"] == nbr_min["nid"], "left")
            .select(
                "id",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias(
                    "label"
                ),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("label") != F.col("old_label")).count()
        labels = new_labels.drop("old_label")
        if changed == 0:
            break
    und.unpersist()
    return labels.select("id", F.col("label").alias("component"))


# --- SimHash -----------------------------------------------------------------

_HEXDIGITS = "0123456789abcdef"


def _hash_bit(h, j: int):
    """Bit j (0-based, MSB-first within each hex digit) of an md5 hex
    string column ``h``."""
    digit = F.substring(h, 1 + j // 4, 1)
    val = F.instr(F.lit(_HEXDIGITS), digit) - 1  # hex digit -> 0..15
    return F.shiftright(val, 3 - (j % 4)) % 2


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """16-bit SimHash: per token-occurrence hash bits vote +1/-1 per
    position; sign of the sum sets the output bit. Entirely JVM-side:
    explode + one groupBy with ``bits`` integer sums. The token md5 is
    materialized ONCE per token row (a projection below the aggregate)
    instead of once per bit — Catalyst does not CSE the 16 copies."""
    # packing bound: the signature accumulates bit*2^j into ONE signed
    # long; j = bits-1 must stay below the sign bit or the top term
    # silently wraps negative (same guard family as the KS 2^31 check,
    # plans/relational.py).
    assert bits <= 62, f"simhash bits={bits} overflows signed-long packing"
    # hash-partition by id (not _widen's round-robin): parallelizes the
    # explode AND satisfies the groupBy(id) distribution — one shuffle
    # for the whole signature (round-5 move; integer vote sums are
    # order-free, so the result is bit-identical)
    target = docs.sparkSession.sparkContext.defaultParallelism * 2
    tok_rows = docs.repartition(target, id_col).select(
        F.col(id_col).alias("id"), F.explode(norm_tokens((F.col(text_col)))).alias("tok")
    ).select("id", F.md5(F.col("tok")).alias("h"))
    votes = [
        F.sum(_hash_bit(F.col("h"), j) * 2 - 1).alias(f"v{j}") for j in range(bits)
    ]
    sums = tok_rows.groupBy("id").agg(*votes)
    sig = None
    for j in range(bits):
        bit = F.when(F.col(f"v{j}") >= 0, F.lit(1)).otherwise(F.lit(0))
        term = bit.cast("long") * F.lit(1 << j).cast("long")
        sig = term if sig is None else sig + term
    return sums.select("id", sig.alias("simhash"))


def simhash_near_pairs(sig_df: DataFrame, max_hamming: int = 3,
                       bits: int = SIMHASH_BITS, bands: int = 4) -> DataFrame:
    """Pairs with hamming(simhash) <= max_hamming, found by banding the
    signature into ``bands`` equal bit-chunks and equi-joining on any
    identical chunk (sound for max_hamming < bands by pigeonhole)."""
    chunk = bits // bands
    mask = (1 << chunk) - 1
    banded = sig_df.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftright(F.col("simhash"), b * chunk).cast("long")
                            % F.lit(mask + 1)
                        ).alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    # persist before the self-join: otherwise the token-vote signature
    # aggregation runs once per join side (ephemeral: released by the
    # harness after the consuming query materializes)
    banded = cache.ephemeral(banded)
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.expr("h1 ^ h2"))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.simhash").alias("h1"),
            F.col("b.simhash").alias("h2"),
        )
        # hamming filter BEFORE distinct: the filter is a cheap per-row
        # expression that kills ~all of the candidate volume, so the
        # distinct (a shuffle) moves a handful of rows instead of the
        # full band-collision blowup
        .filter(hamming <= max_hamming)
        .distinct()
        .select("id1", "id2", hamming.cast("int").alias("hamming"))
    )
