"""Round-12 measurement helper (guide §1: measure first).

Usage:
    python tests/r12_measure.py time  name1,name2,...   [sf_dir]
    python tests/r12_measure.py plans name1,name2,...   outdir [sf_dir]
    python tests/r12_measure.py tail  [sf_dir]

- ``time``: runs the named entries in bench order inside ONE session
  (bench.py's warm-ups included) and prints, per entry, the time spent
  in plan construction (``q.fn``) vs execution (``count()``), plus the
  per-interval host steal%%. Family caches behave exactly as in
  bench.py (released only at the end), so first-touch build absorption
  is visible.
- ``plans``: writes ``<outdir>/<name>.txt`` with ``explain("formatted")``
  for each named entry (plan construction only, nothing executed
  beyond what eager family caches do on first touch).
- ``tail``: times every catalog entry like ``time`` but prints only the
  aggregate fn-vs-count split for the sub-second tail — the round-12
  question "is the 68 s tail plan-construction overhead or execution?".
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cpu_attrib, _cpu_snap  # noqa: E402


def _session(sf_dir: str):
    from kafka_avro_order_processor_eg_4131_spark.session import get_spark

    spark = get_spark(app_name="r12-measure")
    # same warm-ups as bench.py so first-entry numbers are comparable
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).count()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    _noop = pandas_udf(lambda s: s, "long")
    spark.range(spark.sparkContext.defaultParallelism * 2).repartition(
        spark.sparkContext.defaultParallelism
    ).select(_noop(F.col("id"))).count()
    return spark


def cmd_time(names: list[str], sf_dir: str) -> None:
    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

    spark = _session(sf_dir)
    print(f"{'entry':42s} {'fn_s':>8s} {'count_s':>8s} {'total_s':>8s} {'steal%':>7s}")
    for name in sorted(names):
        q = REGISTRY[name]
        c0 = _cpu_snap()
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        att = _cpu_attrib(c0, _cpu_snap()) or {}
        print(
            f"{name:42s} {t1 - t0:8.3f} {t2 - t1:8.3f} {t2 - t0:8.3f}"
            f" {att.get('steal_pct', float('nan')):7.2f}"
        )
        C.release_ephemeral()
    C.release_all()
    spark.stop()


def cmd_plans(names: list[str], outdir: str, sf_dir: str) -> None:
    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

    os.makedirs(outdir, exist_ok=True)
    spark = _session(sf_dir)
    for name in sorted(names):
        q = REGISTRY[name]
        df = q.fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # same as explain()
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print(f"wrote {outdir}/{name}.txt ({len(txt)} bytes)")
        C.release_ephemeral()
    C.release_all()
    spark.stop()


def _codegen_metrics(spark):
    """(n_compiles, mean_ms, total_generated_bytes) from Spark's
    CodegenMetrics source — quantifies how much of a run is Janino
    compilation (guide §1: measure before optimizing)."""
    m = spark._jvm.org.apache.spark.metrics.source.CodegenMetrics
    h = m.METRIC_COMPILATION_TIME()
    return (
        h.getCount(),
        h.getSnapshot().getMean(),
        m.METRIC_GENERATED_CLASS_BYTECODE_SIZE().getCount(),
    )


def cmd_tail(sf_dir: str) -> None:
    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

    spark = _session(sf_dir)
    cg0 = _codegen_metrics(spark)
    rows = []
    for name, q in sorted(REGISTRY.items()):
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        t1 = time.perf_counter()
        df.count()
        t2 = time.perf_counter()
        rows.append((name, t1 - t0, t2 - t1, t2 - t0))
        C.release_ephemeral()
    cg1 = _codegen_metrics(spark)
    n_compiles = cg1[0] - cg0[0]
    # mean is over the whole histogram reservoir; approximate the run's
    # compile seconds as delta-count x end-mean (good enough to size
    # the opportunity)
    print(
        f"codegen: {n_compiles} compiles during run, mean {cg1[1]:.1f} ms "
        f"=> ~{n_compiles * cg1[1] / 1000.0:.1f}s total compile time"
    )
    C.release_all()
    spark.stop()
    tail = [r for r in rows if r[3] < 1.0]
    mid = [r for r in rows if 1.0 <= r[3] < 2.0]
    top = [r for r in rows if r[3] >= 2.0]
    for label, grp in (("<1s", tail), ("1-2s", mid), (">=2s", top)):
        fn_s = sum(r[1] for r in grp)
        ct_s = sum(r[2] for r in grp)
        print(
            f"band {label:5s}: n={len(grp):3d} fn={fn_s:7.2f}s "
            f"count={ct_s:7.2f}s total={fn_s + ct_s:7.2f}s"
        )
    print(f"grand total: {sum(r[3] for r in rows):.2f}s")
    # the 15 worst fn() constructions — py4j-chatter hot spots
    for name, fn_t, ct_t, tot in sorted(rows, key=lambda r: -r[1])[:15]:
        print(f"  fn-heavy: {name:42s} fn={fn_t:6.3f} count={ct_t:6.3f}")


def main() -> None:
    cmd = sys.argv[1]
    if cmd == "time":
        names = sys.argv[2].split(",")
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        cmd_time(names, sf_dir)
    elif cmd == "plans":
        names = sys.argv[2].split(",")
        outdir = sys.argv[3]
        sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
        cmd_plans(names, outdir, sf_dir)
    elif cmd == "tail":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
        cmd_tail(sf_dir)
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
