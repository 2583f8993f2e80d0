"""Semantic tests for the late-round-2 operators, beyond the oracle
harness: MMR greedy invariants, Markov row-stochasticity, novelty
bounds, grouped-median membership, canonical-selection keep-best."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY


def test_mmr_matches_exact_python_twin(spark, sf_small):
    """Bit-exact greedy-MMR twin in plain Python floats (same left-fold
    dot products as the engine expressions), at sf_small where the
    oracle harness doesn't run."""
    from kafka_avro_order_processor_eg_4131_spark.catalog import load

    rows = REGISTRY["ann_mmr_diversified"].fn(spark, sf_small).collect()
    assert [r["step"] for r in rows] == [1, 2, 3, 4, 5]
    assert len({r["neighbor_id"] for r in rows}) == 5

    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load(spark, sf_small, "embeddings").collect()
    }

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def cos(a, b):
        return dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))

    q = emb[0]
    rel = {i: cos(q, v) for i, v in emb.items() if i != 0}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:10]
    sims = {(a, b): cos(emb[a], emb[b]) for a in pool for b in pool if a != b}
    picked, expect = [], []
    for step in range(1, 6):
        best = None
        for i in pool:
            if i in picked:
                continue
            pen = max(sims[(i, s)] for s in picked) if picked else None
            score = 0.7 * rel[i] if pen is None else 0.7 * rel[i] - 0.3 * pen
            if best is None or score > best[1] or (score == best[1] and i < best[0]):
                best = (i, score)
        picked.append(best[0])
        expect.append((step, best[0], rel[best[0]], best[1]))
    got = [(r["step"], r["neighbor_id"], r["rel"], r["mmr_score"]) for r in rows]
    assert got == expect


def test_transition_matrix_rows_are_stochastic(spark, sf_small):
    rows = REGISTRY["event_transition_matrix"].fn(spark, sf_small).collect()
    by_prev: dict[str, float] = {}
    for r in rows:
        assert r["n_transitions"] > 0
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
    for prev, total in by_prev.items():
        assert math.isclose(total, 1.0, rel_tol=1e-12), (prev, total)


def test_shingle_novelty_bounds(spark, sf_small):
    df = REGISTRY["doc_shingle_novelty"].fn(spark, sf_small)
    bad = df.filter(
        (F.col("novelty") < 0) | (F.col("novelty") > 1) | (F.col("n_shingles") <= 0)
    ).count()
    assert bad == 0


def test_grouped_median_is_a_data_value(spark, sf_small):
    med = {
        r["c_mktsegment"]: (r["median_price"], r["n_orders"])
        for r in REGISTRY["median_price_by_segment"].fn(spark, sf_small).collect()
    }
    from kafka_avro_order_processor_eg_4131_spark.catalog import load

    o = load(spark, sf_small, "orders")
    c = load(spark, sf_small, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    for seg, (m, n) in med.items():
        prices = sorted(
            r["o_totalprice"]
            for r in j.filter(F.col("c_mktsegment") == seg).collect()
        )
        assert len(prices) == n
        assert m == prices[(n + 1) // 2 - 1]  # exact lower median, 0-indexed


def test_cluster_canonical_keeps_best_quality(spark, sf_small):
    from kafka_avro_order_processor_eg_4131_spark.catalog import load
    from kafka_avro_order_processor_eg_4131_spark.functions.text import quality_score

    comp_rows = REGISTRY["dedup_cluster_components"].fn(spark, sf_small).collect()
    canon_rows = REGISTRY["dedup_cluster_canonical"].fn(spark, sf_small).collect()
    if not comp_rows:
        assert not canon_rows
        return
    q = {
        r["doc_id"]: r["q"]
        for r in load(spark, sf_small, "documents")
        .select("doc_id", quality_score(F.col("text")).alias("q"))
        .collect()
    }
    members: dict[int, list[int]] = {}
    for r in comp_rows:
        members.setdefault(r["component"], []).append(r["id"])
    assert len(canon_rows) == len(members)
    for r in canon_rows:
        ids = members[r["component"]]
        assert r["cluster_size"] == len(ids)
        # keep-best: no member has strictly higher quality; ties -> min id
        best_q = max(q[i] for i in ids)
        assert q[r["canonical_doc_id"]] == best_q
        assert r["canonical_doc_id"] == min(i for i in ids if q[i] == best_q)


def test_span_corruption_roundtrip_reconstructs_text(spark, sf_small):
    """Substituting each <X_k> sentinel in the input with the tokens the
    target recorded for it must reproduce the normalized document."""
    import re

    from kafka_avro_order_processor_eg_4131_spark.catalog import load

    rows = REGISTRY["doc_span_corruption"].fn(spark, sf_small).collect()
    norm = {
        r["doc_id"]: re.sub(r"\s+", " ", r["text"].strip().lower())
        for r in load(spark, sf_small, "documents").collect()
        if r["text"].strip()
    }
    assert {r["doc_id"] for r in rows} == set(norm)
    masked_total = 0
    for r in rows:
        spans: dict[str, str] = {}
        for part in re.split(r"(?=<X_\d+>)", r["target_text"]):
            if part:
                m = re.match(r"(<X_\d+>) ?(.*)", part)
                spans[m.group(1)] = m.group(2).strip()
        assert len(spans) == r["n_masked_spans"]
        masked_total += r["n_masked_spans"]
        rebuilt = re.sub(
            r"<X_\d+>", lambda m: spans[m.group(0)], r["input_text"]
        )
        rebuilt = re.sub(r"\s+", " ", rebuilt).strip()
        assert rebuilt == norm[r["doc_id"]], r["doc_id"]
    assert masked_total > 0  # the hash actually masks ~25% of blocks
