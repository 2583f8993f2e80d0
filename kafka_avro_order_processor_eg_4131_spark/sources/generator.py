"""Synthetic order generator — S3 in SURVEY.md §2.1.

The reference's producer builds 15 random orders: uuid4 orderId, a
two-capitalized-words product name (the Faker fallback branch,
producer.py:118-124), and price ~ Uniform(5.0, 1500.0) rounded to 2 dp.
It is unseeded and therefore non-reproducible; the engine version is
seeded (determinism is a feature, SURVEY.md §5.1) but preserves the
distributions.

Spark-first: generation is ``spark.range(n)`` so it scales to any n
across executors — no driver-side list building. Randomness derives
per-row from ``sha2(seed || id)`` instead of ``rand()`` so a given
(seed, id) always yields the same order on any cluster topology.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the Faker-fallback flavor: two capitalized words (producer.py:122)
_WORDS = (
    "Amber", "Basic", "Cobalt", "Delta", "Ember", "Fancy", "Gentle", "Hyper",
    "Ivory", "Jolly", "Keen", "Lunar", "Mighty", "Noble", "Opal", "Prime",
    "Quiet", "Rapid", "Solid", "Turbo", "Ultra", "Vivid", "Warm", "Xenon",
    "Young", "Zesty", "Anchor", "Bottle", "Candle", "Drawer", "Engine",
    "Fabric", "Garden", "Hammer", "Island", "Jacket", "Kettle", "Ladder",
    "Mirror", "Needle", "Orchid", "Pencil", "Quartz", "Ribbon", "Saddle",
    "Tablet", "Urchin", "Velvet", "Wallet", "Zipper",
)


def _hash_unit(col, salt: str):
    """Deterministic uniform [0,1) from (salt, value): first 8 hex chars
    of sha2 -> int -> /2^32. Stable across partitionings and retries,
    unlike F.rand which depends on partition layout."""
    h = F.sha2(F.concat(F.lit(salt), col.cast("string")), 256)
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(4294967296.0)


def synthetic_orders_stream(spark: SparkSession, rows_per_second: int = 100, seed: int = 42):
    """Streaming variant of the generator (SURVEY.md §2.1 S3 'streaming
    variant: format(rate)'): the rate source's monotone ``value`` plays
    the role of the row id, everything else derives identically to the
    batch path — the stream twin produces the same order for the same id."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return _order_columns(rate.select(F.col("value").alias("id")), seed)


def _order_columns(base: DataFrame, seed: int) -> DataFrame:
    """Derive (orderId, product, price) from an ``id`` column."""
    sid = F.col("id").cast("string")
    key = F.concat(F.lit(f"seed{seed}:"), sid)
    word = lambda salt: F.element_at(  # noqa: E731
        F.lit(list(_WORDS)),
        (F.conv(F.substring(F.sha2(F.concat(F.lit(salt), key), 256), 1, 7), 16, 10)
         % F.lit(len(_WORDS))).cast("int") + 1,
    )
    price = F.round(_hash_unit(key, "price:") * (1500.0 - 5.0) + 5.0, 2)
    return base.select(
        # uuid4-shaped deterministic id from the row hash
        F.concat_ws(
            "-",
            F.substring(F.sha2(key, 256), 1, 8),
            F.substring(F.sha2(key, 256), 9, 4),
            F.substring(F.sha2(key, 256), 13, 4),
            F.substring(F.sha2(key, 256), 17, 4),
            F.substring(F.sha2(key, 256), 21, 12),
        ).alias("orderId"),
        F.concat_ws(" ", word("w1:"), word("w2:")).alias("product"),
        price.cast("float").alias("price"),
    )


def synthetic_orders(
    spark: SparkSession, n: int = 15, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """n synthetic Order rows: orderId string, product string, price float
    (float32, matching order.avsc:14-17's Avro float)."""
    base = spark.range(0, n, numPartitions=partitions or min(32, max(1, n // 1000 + 1)))
    return _order_columns(base, seed)
