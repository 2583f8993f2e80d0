"""Skew mitigation: salted join and two-stage salted aggregation.

AQE's skew-join splitting (on in session.py) handles most runtime skew;
explicit salting remains the tool when one key dominates so heavily
that even split partitions serialize, or when the skewed side feeds a
window/groupBy rather than a join.

- ``salted_join``: the skewed (large) side gets a random-ish salt in
  [0, n); the small side is replicated n times with every salt value.
  The join key becomes (key, salt) — the hot key's rows spread over n
  partitions. Replication cost: small side x n, which is why the salt
  factor stays single-digit and only the skewed keys need salting
  (pass ``hot_keys`` to restrict).
- ``salted_agg_sum``: partial aggregate on (key, salt), then final
  aggregate on key — two small shuffles instead of one hot one.

Salting uses a deterministic hash of a row-unique column, not rand():
retries and speculative tasks must salt identically or results drift.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(unique_col: Column, n: int) -> Column:
    return F.pmod(F.xxhash64(unique_col), F.lit(n)).cast("int")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    salt_n: int = 8,
    unique_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join large ⋈ small on ``key`` with the large side salted and
    the small side replicated ``salt_n`` times."""
    ucol = F.col(unique_col) if unique_col else F.monotonically_increasing_id()
    l_salted = large.withColumn("__salt", _salt(ucol, salt_n))
    s_replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)]))
    )
    out = l_salted.join(s_replicated, [key, "__salt"], how)
    return out.drop("__salt")


def salted_agg_sum(
    df: DataFrame,
    key: str,
    value: Column,
    salt_n: int = 8,
    unique_col: str | None = None,
) -> DataFrame:
    """SUM(value) GROUP BY key, computed as partial sums over (key, salt)
    then a final sum over key. The value is cast decimal so the two-stage
    regrouping cannot change the result (double sums are order-sensitive).

    Non-finite and out-of-DSUM_BOUND values get catalog.dsum's
    saturating propagation — the per-salt partials carry the class COUNTS (plain integers, so they compose
    across the regrouping exactly like the decimal sums), and the final
    stage applies the same any-NaN / mixed-Inf => NaN resolution. The
    finite sum converts decimal->double THROUGH A STRING like dsum."""
    from ..catalog import DSUM_BOUND

    ucol = F.col(unique_col) if unique_col else F.monotonically_increasing_id()
    in_dom = (
        ~F.isnan(value)
        & (value > F.lit(-DSUM_BOUND))
        & (value < F.lit(DSUM_BOUND))
    )
    fin = F.when(in_dom, value)
    partial = (
        df.withColumn("__salt", _salt(ucol, salt_n))
        .groupBy(key, "__salt")
        .agg(
            F.sum(fin.cast("decimal(30,6)")).alias("__part"),
            F.count(F.when(F.isnan(value), F.lit(1))).alias("__q_nan"),
            F.count(
                F.when(~F.isnan(value) & (value >= F.lit(DSUM_BOUND)), F.lit(1))
            ).alias("__q_pinf"),
            F.count(F.when(value <= F.lit(-DSUM_BOUND), F.lit(1))).alias("__q_ninf"),
            F.count("*").alias("__n"),
        )
    )
    q_nan = F.sum("__q_nan")
    q_pinf = F.sum("__q_pinf")
    q_ninf = F.sum("__q_ninf")
    return partial.groupBy(key).agg(
        F.when((q_nan > 0) | ((q_pinf > 0) & (q_ninf > 0)), F.lit(float("nan")))
        .when(q_pinf > 0, F.lit(float("inf")))
        .when(q_ninf > 0, F.lit(float("-inf")))
        .otherwise(F.sum("__part").cast("string").cast("double"))
        .alias("sum_value"),
        F.sum("__n").alias("n_rows"),
    )
