"""Round-5 plan pins + properties:

- latency_pctiles_by_priority moved to the histogram-rank plan — pin
  that it stays histogram-shaped (no range exchange, no persist, no
  full-fact window) and that its selection rule matches a direct
  Python nearest-rank transcription on random multisets.
- lsh_near_pairs_fused — pin the executed (AQE-final) plan: the
  vector attach becomes broadcast-hash joins with no hint, and the
  only sort-merge join is the bucket self-join.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
from kafka_avro_order_processor_eg_4131_spark.operators import cache as C


def _explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "extended"
    )


class TestLatencyPctilesHistogramShape:
    def test_no_range_exchange_no_persist_no_fact_window(self, spark, sf_small):
        plan = _explain(REGISTRY["latency_pctiles_by_priority"].fn(spark, sf_small))
        # the r3-r4 two-pass row-rank shape would show all three (the
        # final 15-row output orderBy legitimately range-partitions
        # with ENSURE_REQUIREMENTS origin — only an explicit
        # repartitionByRange marks the old kernel)
        assert "REPARTITION_BY_RANGE" not in plan
        assert "InMemoryTableScan" not in plan
        assert "spark_partition_id" not in plan

    def test_histogram_aggregate_feeds_the_window(self, spark, sf_small):
        plan = _explain(REGISTRY["latency_pctiles_by_priority"].fn(spark, sf_small))
        # window over the aggregated relation, partitioned by priority
        assert "Window" in plan and "o_orderpriority" in plan


def _nearest_rank(values: list[int], num: int, den: int) -> int:
    s = sorted(values)
    n = len(s)
    rank = (num * n + den - 1) // den  # ceil(num*n/den)
    return s[rank - 1]


@given(
    st.lists(
        st.tuples(st.sampled_from(["1-URGENT", "2-HIGH", "3-LOW"]),
                  st.integers(min_value=0, max_value=200)),
        min_size=1,
        max_size=120,
    )
)
@settings(max_examples=12, deadline=None)
def test_histogram_selection_rule_matches_python(spark, rows):
    """The cum-count bucket-selection rule (rk > cum - cnt AND
    rk <= cum) over a value histogram must select exactly the
    nearest-rank order statistic, for arbitrary multisets."""
    df = spark.createDataFrame(rows, "grp string, v int")
    hist = df.groupBy("grp", "v").agg(F.count("*").alias("cnt"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w))
    grp = hist.groupBy("grp").agg(F.sum("cnt").alias("n"))
    quant = F.array(
        F.struct(F.lit("p50").alias("q"), F.lit(1).alias("num"), F.lit(2).alias("den")),
        F.struct(F.lit("p90").alias("q"), F.lit(9).alias("num"), F.lit(10).alias("den")),
        F.struct(F.lit("p99").alias("q"), F.lit(99).alias("num"), F.lit(100).alias("den")),
    )
    got = {
        (r["grp"], r["q"]): r["v"]
        for r in cum.join(F.broadcast(grp), "grp")
        .select("grp", "v", "cnt", "cum", "n", F.explode(quant).alias("qq"))
        .withColumn("rk", F.expr("(qq.num * n + qq.den - 1) div qq.den"))
        .filter((F.col("rk") > F.col("cum") - F.col("cnt")) & (F.col("rk") <= F.col("cum")))
        .select("grp", F.col("qq.q").alias("q"), "v")
        .collect()
    }
    by_grp: dict[str, list[int]] = {}
    for g, v in rows:
        by_grp.setdefault(g, []).append(v)
    for g, vals in by_grp.items():
        for q, num, den in [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]:
            assert got[(g, q)] == _nearest_rank(vals, num, den), (g, q, vals)


class TestFusedNearPairsExecutedShape:
    def test_vector_attach_broadcasts_without_hint(self, spark, sf_small):
        """AQE must turn the unhinted vector attach into broadcast-hash
        joins at fixture scale; the bucket self-join may stay
        sort-merge. Checked on the EXECUTED plan (AQE-final), not the
        static one."""
        df = REGISTRY["dedup_embedding_cosine_pairs"].fn(spark, sf_small)
        df.count()
        plan = df._jdf.queryExecution().executedPlan().toString()
        C.release_ephemeral(spark)
        assert "CartesianProduct" not in plan
        assert plan.count("BroadcastHashJoin") >= 2, plan[:1500]
