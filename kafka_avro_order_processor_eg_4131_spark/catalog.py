"""Query catalog: every operator the engine exposes, as a named
(spark_fn, oracle_sql) pair consumed by ``__spark_entry__.py``.

Contract (driver): ``fn(spark, sf_dir) -> DataFrame`` and ``oracle``
is equivalent ANSI SQL DuckDB runs over the same parquet tables. Column
names must match exactly; computed columns are aliased identically on
both sides.

Determinism discipline (why the helpers below exist):
- Sums of doubles are order-dependent in the last ulp; Spark's partial
  aggregation and DuckDB's sequential scan would disagree. Both sides
  therefore cast to DECIMAL(30,6) (exact, order-independent sum) and
  cast the final aggregate back to DOUBLE. double->decimal(…,6)
  rounding is engine-agnostic for these inputs (an exact tie at the
  6th decimal place requires ~40 trailing zero bits — measure-zero for
  the fixtures' uniform doubles).
- Counts: DuckDB SUM(int) yields HUGEINT — always cast to BIGINT to
  match Spark's LongType.
- Per-row double arithmetic (+,-,*,/ and sqrt) is IEEE-754-identical in
  the JVM and C++, so row-level expressions need no special handling;
  transcendentals (log/exp/pow) are NOT guaranteed identical and are
  avoided in oracle-checked queries.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add ``fn(spark, sf_dir) -> DataFrame`` to the catalog."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QueryDef(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


# ---------------------------------------------------------------------------
# determinism helpers (Spark side + SQL side, kept textually adjacent so the
# two implementations can be eyeballed for equivalence)
# ---------------------------------------------------------------------------

DEC = "decimal(30,6)"

_PINF = float("inf")
_NINF = float("-inf")
_NAN = float("nan")

# The dsum family's SUM DOMAIN: |x| < 1e23. DECIMAL(30,6) holds
# |v| < 1e24, so 1e23 leaves a full decimal digit of margin against
# 6-dp rounding at the boundary, and the SUM accumulator (DECIMAL(38,6)
# in both engines) then has headroom for >= 1e9 boundary-magnitude rows
# per group. Finite values AT or beyond the bound cannot be summed
# at all; they SATURATE into the ±Inf classification below (mixed
# signs => NaN) — the contract is "a defined value or a ±Inf/NaN
# sentinel, NEVER a silent drop" (before round 9, Spark's decimal cast
# silently dropped them and DuckDB crashed).
#
# CROSS-ENGINE EXACTNESS is a stronger condition than in-domain: Spark
# casts double->decimal through the SHORTEST-REPR string while DuckDB
# expands the exact binary, so full-entropy doubles diverge in the 6th
# decimal starting around |x| ~ 1e9 (measured head-to-head: 0/4000 at
# 1e5, 134/4000 at 1e9, 2758/4000 at 1e11). The oracle-checked value
# domains are all cast-portable — low-entropy money decimals (<= 4 dp),
# values < ~1e6, exact integers below 2^53, or exact powers/multiples
# of ten up to 1e22 — and the magnitude fixture probes the domain
# boundary with exactly such values. Feeding dsum full-entropy doubles
# in [1e9, 1e23) is in-contract for SPARK-side determinism (decimal
# sums are order-independent regardless) but not for oracle parity.
DSUM_BOUND = 1e23


def is_finite(col: Column) -> Column:
    """True for finite doubles, false for NaN/±Inf, NULL for NULL —
    identical three-valued shape as DuckDB's isfinite()."""
    return ~F.isnan(col) & (col != F.lit(_PINF)) & (col != F.lit(_NINF))


def finite_sql(expr: str) -> str:
    return f"isfinite(({expr}))"


def dsum(col: Column) -> Column:
    """Order-independent SUM of a double column, returned as double.

    The decimal->double conversion goes THROUGH A STRING on both sides:
    DuckDB's direct decimal->double cast double-rounds (int128 -> double,
    then /10^scale) and can be 1 ulp off the true value; decimal->string
    is exact and string->double is correctly rounded in both engines.

    Non-finite and out-of-domain inputs (round-9 float/magnitude
    probes): IEEE double-sum semantics, order-independently — any NaN
    (or positive AND negative out-of-domain values) in the group =>
    NaN; else any value >= DSUM_BOUND (incl. +Inf) => +Inf; else any
    value <= -DSUM_BOUND (incl. -Inf) => -Inf; else the exact decimal
    sum of the in-domain values. Before round 9 Spark silently DROPPED
    non-finite and >=1e24 values (double->decimal casts to NULL) while
    DuckDB crashed on them — a NaN price or a 1e300 outlier vanishing
    from a 100 TB revenue total is precisely the silent-corruption
    class this engine refuses: the result is exact or a loud
    sentinel."""
    nan_n = F.count(F.when(F.isnan(col), F.lit(1)))
    # NaN compares largest under both engines' total order, so the
    # magnitude tests must exclude it explicitly on the positive side
    p_n = F.count(F.when(~F.isnan(col) & (col >= F.lit(DSUM_BOUND)), F.lit(1)))
    n_n = F.count(F.when(col <= F.lit(-DSUM_BOUND), F.lit(1)))
    in_dom = (
        ~F.isnan(col) & (col > F.lit(-DSUM_BOUND)) & (col < F.lit(DSUM_BOUND))
    )
    fin = F.sum(F.when(in_dom, col).cast(DEC)).cast("string").cast("double")
    return (
        F.when((nan_n > 0) | ((p_n > 0) & (n_n > 0)), F.lit(_NAN))
        .when(p_n > 0, F.lit(_PINF))
        .when(n_n > 0, F.lit(_NINF))
        .otherwise(fin)
    )


def dsum_sql(expr: str) -> str:
    # the double->decimal cast ALSO goes through VARCHAR (round-10
    # combined-edge probe): Spark casts via BigDecimal(shortest-string)
    # while DuckDB's direct cast SCALES IN BINARY (value * 10^6 through
    # doubles), so CAST(9e22 AS DECIMAL(30,6)) lands ~6e6 off the
    # string-exact decimal — under half a double-ulp per row, which the
    # final decimal->double rounding hid until enough big rows (or a
    # downstream cumulative ladder, see pareto_abc_parts_revenue)
    # accumulated it past an ulp. VARCHAR routes are identical in both
    # directions and both engines round scale-6 ties the same way
    # (probed: 5e-7, big magnitudes, long expansions).
    e = f"({expr})"
    fin = (
        f"CAST(CAST(SUM(CAST(CAST(CASE WHEN NOT isnan({e}) AND {e} > -1e23 "
        f"AND {e} < 1e23 THEN {e} END AS VARCHAR) "
        f"AS DECIMAL(30,6))) AS VARCHAR) AS DOUBLE)"
    )
    nan_n = f"COUNT(CASE WHEN isnan({e}) THEN 1 END)"
    p_n = f"COUNT(CASE WHEN NOT isnan({e}) AND {e} >= 1e23 THEN 1 END)"
    n_n = f"COUNT(CASE WHEN {e} <= -1e23 THEN 1 END)"
    return (
        f"CASE WHEN {nan_n} > 0 OR ({p_n} > 0 AND {n_n} > 0) THEN 'nan'::DOUBLE "
        f"WHEN {p_n} > 0 THEN 'infinity'::DOUBLE "
        f"WHEN {n_n} > 0 THEN '-infinity'::DOUBLE "
        f"ELSE {fin} END"
    )


def dsum_over(col: Column, w) -> Column:
    """dsum over a window frame: the same IEEE-propagating decimal sum,
    with every constituent aggregate evaluated OVER the same frame
    (a window expression can't host the grouped dsum composite
    directly, but a composite OF windowed aggregates is fine)."""
    nan_n = F.count(F.when(F.isnan(col), F.lit(1))).over(w)
    p_n = F.count(
        F.when(~F.isnan(col) & (col >= F.lit(DSUM_BOUND)), F.lit(1))
    ).over(w)
    n_n = F.count(F.when(col <= F.lit(-DSUM_BOUND), F.lit(1))).over(w)
    in_dom = (
        ~F.isnan(col) & (col > F.lit(-DSUM_BOUND)) & (col < F.lit(DSUM_BOUND))
    )
    fin = (
        F.sum(F.when(in_dom, col).cast(DEC))
        .over(w)
        .cast("string")
        .cast("double")
    )
    return (
        F.when((nan_n > 0) | ((p_n > 0) & (n_n > 0)), F.lit(_NAN))
        .when(p_n > 0, F.lit(_PINF))
        .when(n_n > 0, F.lit(_NINF))
        .otherwise(fin)
    )


def dsum_over_sql(expr: str, over: str) -> str:
    """dsum_sql over a window: ``over`` is the full 'OVER (...)' text,
    appended to each constituent aggregate."""
    e = f"({expr})"
    # VARCHAR-routed double->decimal cast — see dsum_sql (round-10)
    fin = (
        f"CAST(CAST(SUM(CAST(CAST(CASE WHEN NOT isnan({e}) AND {e} > -1e23 "
        f"AND {e} < 1e23 THEN {e} END AS VARCHAR) "
        f"AS DECIMAL(30,6))) {over} AS VARCHAR) AS DOUBLE)"
    )
    nan_n = f"COUNT(CASE WHEN isnan({e}) THEN 1 END) {over}"
    p_n = f"COUNT(CASE WHEN NOT isnan({e}) AND {e} >= 1e23 THEN 1 END) {over}"
    n_n = f"COUNT(CASE WHEN {e} <= -1e23 THEN 1 END) {over}"
    return (
        f"CASE WHEN {nan_n} > 0 OR ({p_n} > 0 AND {n_n} > 0) THEN 'nan'::DOUBLE "
        f"WHEN {p_n} > 0 THEN 'infinity'::DOUBLE "
        f"WHEN {n_n} > 0 THEN '-infinity'::DOUBLE "
        f"ELSE {fin} END"
    )


def cents(col: Column, scale: float = 100.0) -> Column:
    """Exact integer cents (half-up) of a FINITE double; non-finite
    amounts yield NULL and drop out of sums exactly like SQL NULLs.

    The cents domain is integer — it cannot represent NaN/±Inf, and the
    engines' raw behaviors diverge violently (Spark floor(NaN) silently
    returns 0; DuckDB crashes casting NaN to BIGINT), so the pinned
    portable semantics is NULL-exclusion, symmetric on both sides
    (round-9 float-edge probe). The domain is also MAGNITUDE-bounded:
    floor(x*scale + 0.5) must fit BIGINT, so |x| < 9e18/scale —
    out-of-domain amounts are excluded like non-finite ones (round-9
    magnitude probe; raw behavior was a CAST_OVERFLOW crash in BOTH
    engines). Callers that need poisoning semantics should pair the
    cents sum with a dsum of the same column (which propagates
    NaN/Inf/out-of-domain) — see docs/PLANS.md."""
    bound = 9e18 / scale
    return F.when(
        is_finite(col) & (F.abs(col) < F.lit(bound)),
        F.floor(col * scale + F.lit(0.5)).cast("bigint"),
    )


def cents_sql(expr: str, scale: str = "100.0") -> str:
    e = f"({expr})"
    bound = repr(9e18 / float(scale))
    return (
        f"CASE WHEN isfinite({e}) AND abs({e}) < {bound} "
        f"THEN CAST(floor({e} * {scale} + 0.5) AS BIGINT) END"
    )


def davg(col: Column) -> Column:
    """Order-independent AVG of a double column (exact sum / count)."""
    return dsum(col) / F.count(col)


def davg_sql(expr: str) -> str:
    return f"({dsum_sql(expr)} / COUNT({expr}))"


def bigcount_sql(expr: str = "*") -> str:
    """COUNT with an explicit BIGINT cast (DuckDB returns BIGINT already,
    the cast documents the contract with Spark's LongType)."""
    return f"CAST(COUNT({expr}) AS BIGINT)"


def bigsum_sql(expr: str) -> str:
    """SUM over integer expressions: DuckDB widens to HUGEINT; Spark keeps
    LongType — force BIGINT."""
    return f"CAST(SUM({expr}) AS BIGINT)"


def pctile_sql(vs: str, q: str) -> str:
    """Explicit continuous-percentile interpolation over ``vs``, a
    DuckDB list expression ALREADY sorted ascending (NULLs excluded by
    the caller's FILTER; NaN, if admitted, sorts last in both engines).

    Mirrors Spark's exact ``percentile`` bit-for-bit — which DuckDB's
    ``quantile_cont`` does NOT (round-10 combined-edge probe): Spark's
    implementation is COUNTS-based, so duplicates collapse and a rank
    falling between two TIED values returns the value verbatim, while
    quantile_cont re-rounds its interpolation expression there,
    drifting one ulp on values like 123.45 (measured:
    quantile_cont([...,123.45,123.45,...], 0.9) = 123.44999999999999
    vs Spark/IEEE 123.45). Ties at fractional positions are common in
    real price data; every earlier fixture dodged this by luck of
    group sizes. For UNEQUAL brackets Spark computes
    ``(ceil(r)-r)*lo + (r-floor(r))*hi`` directly on the full-
    magnitude rank r — NOT ``(1-f)*lo + f*hi`` on the fractional part,
    which rounds differently at large ranks (sf0.01's 10k-row groups
    exposed the difference at the last ulp). Formula selected by a
    31-case empirical battery against Spark (ties, ±Inf, n up to
    10000, boundary ranks): zero mismatches; the sweeps re-verify it
    on every fixture class. NaN bracketing is safe under either
    branch: DuckDB's total order makes NaN = NaN true -> returns NaN;
    Spark's counts map collapses equal NaNs -> returns NaN.
    """
    n = f"len({vs})"
    # q MUST be a DOUBLE: DuckDB parses bare 0.9 as DECIMAL(2,1) and
    # runs the rank arithmetic in decimal, off Spark's by an ulp
    r = f"(CAST({q} AS DOUBLE) * ({n} - 1))"
    lo = f"{vs}[CAST(floor({r}) AS BIGINT) + 1]"
    hi = f"{vs}[CAST(ceil({r}) AS BIGINT) + 1]"
    return (
        f"CASE WHEN {vs} IS NULL OR {n} = 0 THEN NULL "
        f"WHEN floor({r}) = ceil({r}) OR {lo} = {hi} THEN {lo} "
        f"ELSE (ceil({r}) - {r}) * {lo} + ({r} - floor({r})) * {hi} END"
    )


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .operators import cache as C
    from .shipping import ship_package
    from .sources.tables import load_table

    # every catalog query funnels through here — guarantees executor
    # workers can import this package before any Python UDF runs
    ship_package(spark)
    # Session-memoized LOADED RELATION (round 11): a fresh
    # spark.read.parquet costs ~100 ms of driver time per call (file
    # listing + footer/schema resolution) and the catalog makes
    # hundreds of load() calls per run — reusing the resolved
    # DataFrame object removes that fixed cost from every query after
    # the first. This memoizes the LAZY PLAN only, never data: each
    # consumer still gets full predicate pushdown, column pruning, and
    # a fresh physical plan (the shared family caches in
    # operators/cache.py are the data-level reuse and are unchanged).
    # Self-joins of the same relation object are already the norm in
    # this package (every family cache is one shared DataFrame) and
    # Spark 4's relation deduplication handles them; the full oracle
    # gate + every fixture sweep run against this path.
    #
    # CONSTRAINT for plan authors (round-12 advice): because two
    # load() calls for the same table now return the SAME object, a
    # join of a table to itself written with df['col'] / F.col()
    # attribute references on "both" sides is a literal self-join —
    # Spark may raise AMBIGUOUS_SELF_JOIN or silently resolve both
    # references to one side (a trivially-true condition a fresh read
    # never produced). When joining a table to itself, either use
    # string join keys (df.join(df2, "key")) or explicitly
    # .alias("l")/.alias("r") the two sides and qualify every column.
    return C.memo(
        spark,
        f"table.{name}",
        sf_dir,
        lambda: load_table(spark, sf_dir, name),
    )


# ---------------------------------------------------------------------------
# populate the registry — importing each plan module runs its @register calls
# ---------------------------------------------------------------------------


def _populate() -> None:
    from .plans import (  # noqa: F401
        dedup,
        multimodal,
        parity,
        relational,
        sampling,
        similarity,
        sketches,
        textops,
        tpch_extra,
        timeops,
        windows,
    )


_populate()
