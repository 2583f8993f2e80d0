"""Round-13 probe (guide §1: measure first): for the deep-lineage dedup
heavies, split each entry into
  - fn1: first plan construction (py4j + eager analysis; absorbs family
    builder plan construction),
  - fn2: a SECOND fn() call in the same session — the cost plan
    memoization would remove,
  - count1: first execution,
  - count2: a second count() on the SECOND DataFrame — re-planning +
    cache-hit execution (what a consumer pays once families are hot),
plus the Catalyst phase breakdown (QueryPlanningTracker) of count1.

Usage: python tests/r13_probe.py name1,name2,... [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_attrib, _cpu_snap  # noqa: E402


def phases(df) -> dict[str, float]:
    """QueryPlanningTracker phase millis for a DataFrame's execution."""
    qe = df._jdf.queryExecution()
    t = qe.tracker()
    out = {}
    it = t.phases().keysIterator()
    while it.hasNext():
        k = it.next()
        s = t.phases().apply(k)
        out[k] = (s.endTimeMs() - s.startTimeMs()) / 1000.0
    return out


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
    from kafka_avro_order_processor_eg_4131_spark.session import get_spark

    spark = get_spark(app_name="r13-probe")
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()

    for name in names:
        q = REGISTRY[name]
        c0 = _cpu_snap()
        t0 = time.perf_counter()
        df1 = q.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df1.count()
        t2 = time.perf_counter()
        df2 = q.fn(spark, sf_dir)
        t3 = time.perf_counter()
        df2.count()
        t4 = time.perf_counter()
        att = _cpu_attrib(c0, _cpu_snap()) or {}
        ph = phases(df1)
        print(
            f"{name}: fn1={t1-t0:.3f} count1={t2-t1:.3f} "
            f"fn2={t3-t2:.3f} count2={t4-t3:.3f} steal={att.get('steal_pct')}"
        )
        print(f"  phases(count1): { {k: round(v,3) for k,v in sorted(ph.items())} }")
        C.release_ephemeral()
    C.release_all()
    spark.stop()


if __name__ == "__main__":
    main()
