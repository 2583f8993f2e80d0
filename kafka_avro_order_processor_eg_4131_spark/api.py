"""User-facing entry points: the one-stop API a user switching from the
reference would use.

    from kafka_avro_order_processor_eg_4131_spark import api
    spark = api.session()
    api.sql(spark, "/data/sf0.1", "SELECT ... FROM orders JOIN ...")
    api.run_query(spark, "/data/sf0.1", "route_status_agg")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import get_spark
from .shipping import ship_package
from .sources.tables import register_temp_views


def session(**kwargs) -> SparkSession:
    return get_spark(**kwargs)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run arbitrary Spark SQL over the fixture tables (registered as
    temp views: region nation customer supplier part orders lineitem
    events documents embeddings)."""
    ship_package(spark)
    register_temp_views(spark, sf_dir)
    return spark.sql(query)


def run_query(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Run a named catalog query (see catalog.REGISTRY / docs/COVERAGE.md)."""
    from .catalog import REGISTRY

    return REGISTRY[name].fn(spark, sf_dir)


def list_queries() -> list[str]:
    from .catalog import REGISTRY

    return sorted(REGISTRY)


def describe_query(name: str) -> str:
    """The query's docstring (what it computes, scale notes)."""
    from .catalog import REGISTRY

    return REGISTRY[name].doc


def explain(spark: SparkSession, sf_dir: str, name: str, mode: str = "formatted") -> str:
    """The physical plan of a named catalog query — the tool for
    checking pushdown/broadcast/shuffle shape before running at scale
    (docs/PLANS.md records the reviewed baselines)."""
    df = run_query(spark, sf_dir, name)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )
