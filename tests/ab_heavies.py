"""A/B attribution harness for the dedup/graph heavy family (round-9
verdict item 1: the family measured +25-60% over its round-8 floor in
three independent runs; the three suspects are deliberate round-9
robustness additions). Usage, one variant per PROCESS (fresh JVM, no
cross-variant cache contamination):

    python /root/repo/tests/ab_heavies.py base          [reps] [sf_dir]
    python /root/repo/tests/ab_heavies.py plain_lower   [reps] [sf_dir]
    python /root/repo/tests/ab_heavies.py no_basket_cap [reps] [sf_dir]
    python /root/repo/tests/ab_heavies.py base_ann      [reps] [sf_dir]
    python /root/repo/tests/ab_heavies.py no_vec_fence  [reps] [sf_dir]

Variants monkeypatch the SUSPECT back to its round-8 form IN PROCESS —
product code stays clean, and the patch is value-visible only to this
timing run (no oracle comparison happens here):

- plain_lower: functions.text.canon_lower -> plain lower() (undoes the
  round-9 portable casefold at every fingerprint/term/shingle site;
  canon_lower is referenced only through functions/text.py globals, so
  the module-level patch reaches normalize/norm_tokens/fingerprint and
  every plan built on them).
- no_basket_cap: plans.relational._basket_capped -> identity (undoes
  the per-plan oversized-order aggregate + broadcast anti-join).
- no_vec_fence: plans.similarity.valid_vec -> always-true (undoes the
  ANN-family shape fence; measured over the ANN subset, not the dedup
  one — no dedup heavy reads the embeddings table).

Protocol: per repetition, release ALL family caches, then run the
subset in sorted(REGISTRY) order (bench.py's order), timing each
entry's count(). The family builds are therefore paid inside the
subset every rep — exactly where the suspects live. Per-rep host
steal%% is reported so a contended window is visible. Output: one JSON
line per rep plus a median-summary JSON line (machine-readable for
docs/PLANS.md)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVIES = [
    "copurchase_part_pairs_lift",
    "corpus_dedup_rate_by_source",
    "dedup_embedding_cosine_pairs",
    "dedup_family_agreement",
    "graph_bfs_hops_recursive",
    "graph_kcore_members",
    "graph_triangle_count",
    "pagerank_copurchase_top20",
]
ANN_HEAVIES = [
    "ann_cosine_topk",
    "ann_eval_fusion_gain",
    "ann_ivf_kmeans_topk",
    "ann_mmr_diversified",
    "ann_rrf_fusion",
]


def _apply_variant(variant: str) -> list[str]:
    """Patch the suspect back to its round-8 form; return the subset."""
    from pyspark.sql import functions as F

    if variant == "base":
        return HEAVIES
    if variant == "plain_lower":
        from kafka_avro_order_processor_eg_4131_spark.functions import text as T

        T.canon_lower = lambda c: F.lower(c)
        return HEAVIES
    if variant == "no_basket_cap":
        from kafka_avro_order_processor_eg_4131_spark.plans import relational as R

        R._basket_capped = lambda li: li
        return HEAVIES
    if variant == "no_vec_fence":
        from kafka_avro_order_processor_eg_4131_spark.plans import similarity as S

        S.valid_vec = lambda c, dim=64: F.lit(True)
        return ANN_HEAVIES
    if variant == "base_ann":
        return ANN_HEAVIES
    if variant == "no_warm":
        # round-12 A/B (historical): compared the concurrent near-dup
        # three-chain warm against serial absorption. Measured EQUAL
        # subset totals (~32.4 s median, 5 reps each) with the warm
        # tripling corpus_dedup_rate's noise cross-section, so the warm
        # was reverted — `no_warm` is now identical to `base`; kept so
        # the recorded A/B command lines stay runnable.
        return HEAVIES
    raise SystemExit(f"unknown variant {variant!r}")


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    subset = _apply_variant(variant)

    import bench
    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
    from kafka_avro_order_processor_eg_4131_spark.session import get_spark

    spark = get_spark(app_name=f"ab-heavies-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    # bench.py's session warm-ups matter less here because rep 0 is
    # discarded-in-spirit (medians over reps 0..n-1 with family rebuild
    # per rep level the codegen field); still warm the worker pool once
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _noop = pandas_udf(lambda s: s, "long")
    spark.range(64).repartition(32).select(_noop(F.col("id"))).count()

    per_rep: list[dict] = []
    for rep in range(reps):
        C.release_all()  # every rep pays the family builds afresh
        cpu0 = bench._cpu_snap()
        timings: dict[str, float] = {}
        t0 = time.perf_counter()
        for name in sorted(subset):
            q0 = time.perf_counter()
            REGISTRY[name].fn(spark, sf_dir).count()
            timings[name] = round(time.perf_counter() - q0, 3)
            C.release_ephemeral()
        total = round(time.perf_counter() - t0, 3)
        att = bench._cpu_attrib(cpu0, bench._cpu_snap()) or {}
        line = {
            "variant": variant,
            "rep": rep,
            "total": total,
            "steal_pct": att.get("steal_pct"),
            "busy_pct": att.get("busy_pct"),
            "queries": timings,
        }
        per_rep.append(line)
        print(json.dumps(line), flush=True)

    med = {
        name: sorted(r["queries"][name] for r in per_rep)[reps // 2]
        for name in sorted(subset)
    }
    print(
        json.dumps(
            {
                "variant": variant,
                "summary": "median",
                "total_median": sorted(r["total"] for r in per_rep)[reps // 2],
                "max_steal_pct": max(
                    (r["steal_pct"] for r in per_rep if r["steal_pct"] is not None),
                    default=None,
                ),
                "queries": med,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
