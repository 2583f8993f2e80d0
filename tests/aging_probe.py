"""Long-session bench-aging probe (round-7 verdict item 1).

Evidence to explain: driver bench totals swing 161-218s across rounds on
unchanged plans; a 218.3s run re-ran at 169.3s minutes later; single
queries print far outside their fresh-process floor bands only in long
sessions (bpe_segment_stats 5.17s in the driver's 223-query session vs
a 2.27-3.79s five-run fresh band); the repo memory notes 3-4x tail
degradation in long single-JVM sweeps.

Mechanism candidates, each with a JMX fingerprint this probe records
after EVERY query:

- JVM code-cache exhaustion: 223 distinct plans generate hundreds of
  whole-stage-codegen classes; when the JIT's code cache fills, HotSpot
  stops compiling ("CodeCache is full") and hot loops run interpreted —
  the classic 3-4x cliff. Fingerprint: CodeHeap pool usage plateaus at
  its limit while total JIT compilation time flatlines.
- Metaspace / loaded-class growth -> longer full GCs. Fingerprint:
  loaded-class count and Metaspace usage grow monotonically; GC time
  per query rises in the tail.
- Heap old-gen accumulation (broadcasts, plan caches, listener state).
  Fingerprint: post-GC heap floor rises across the run.

Usage (NOT a pytest test — a measurement harness):

    python tests/aging_probe.py [--passes 2] [--sf-dir /root/testdata/sf0.1]

Runs the full catalog ``--passes`` times in ONE session (families
released between passes so every pass pays the same builds), printing
per-pass totals, the top pass-over-pass regressors, and the JMX
trajectory. A second pass materially slower than the first inside one
process is in-JVM aging; identical passes mean the driver-run swings
are cross-process/box noise instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def jvm_metrics(spark) -> dict:
    """One JMX snapshot: GC, JIT, classes, and the memory pools that
    fingerprint the candidate mechanisms."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    out: dict = {}
    gc_ms = gc_n = 0
    gcs = mf.getGarbageCollectorMXBeans()
    for i in range(gcs.size()):
        g = gcs.get(i)
        gc_ms += g.getCollectionTime()
        gc_n += g.getCollectionCount()
    out["gc_ms"] = gc_ms
    out["gc_count"] = gc_n
    out["jit_ms"] = mf.getCompilationMXBean().getTotalCompilationTime()
    out["classes"] = mf.getClassLoadingMXBean().getLoadedClassCount()
    heap = mf.getMemoryMXBean().getHeapMemoryUsage()
    out["heap_used_mb"] = heap.getUsed() // (1 << 20)
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        name = p.getName()
        if "CodeHeap" in name or name == "Metaspace":
            u = p.getUsage()
            key = (
                name.replace("CodeHeap '", "code_")
                .replace("'", "")
                .replace(" ", "_")
                .replace("-", "_")
                .lower()
            )
            out[f"{key}_mb"] = u.getUsed() // (1 << 20)
            if p.getUsage().getMax() > 0:
                out[f"{key}_max_mb"] = u.getMax() // (1 << 20)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="/tmp/aging_probe.json")
    args = ap.parse_args()

    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
    from kafka_avro_order_processor_eg_4131_spark.session import get_spark

    spark = get_spark(app_name="aging-probe")
    jvm_args = []
    rt = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getRuntimeMXBean()
    ja = rt.getInputArguments()
    for i in range(ja.size()):
        jvm_args.append(ja.get(i))
    print("JVM args:", " ".join(jvm_args), file=sys.stderr)

    # bench.py's session warm-up, abbreviated: footers + a pandas UDF
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    spark.read.parquet(os.path.join(args.sf_dir, "orders.parquet")).count()
    _noop = pandas_udf(lambda s: s, "long")
    spark.range(64).repartition(32).select(_noop(F.col("id"))).count()

    snaps: list[dict] = []
    per_pass: list[dict[str, float]] = []
    for pno in range(args.passes):
        timings: dict[str, float] = {}
        for name, q in sorted(REGISTRY.items()):
            t0 = time.perf_counter()
            try:
                q.fn(spark, args.sf_dir).count()
                timings[name] = round(time.perf_counter() - t0, 4)
            except Exception as exc:  # keep probing
                timings[name] = -1.0
                print(f"PROBE ERROR {name}: {exc}", file=sys.stderr)
            finally:
                C.release_ephemeral()
            m = jvm_metrics(spark)
            m["pass"] = pno
            m["query"] = name
            m["sec"] = timings[name]
            snaps.append(m)
        per_pass.append(timings)
        C.release_families(spark)

    with open(args.out, "w") as f:
        json.dump({"jvm_args": jvm_args, "snaps": snaps}, f)

    for pno, t in enumerate(per_pass):
        print(f"pass {pno}: total {sum(v for v in t.values() if v > 0):.1f}s")
    if len(per_pass) >= 2:
        a, b = per_pass[0], per_pass[-1]
        deltas = sorted(
            ((b[k] - a[k], k, a[k], b[k]) for k in a if a[k] > 0 and b[k] > 0),
            reverse=True,
        )
        print("top pass-over-pass regressors (delta_s, query, first, last):")
        for d, k, x, y in deltas[:15]:
            print(f"  {d:+.2f}  {k}  {x:.2f} -> {y:.2f}")
        slow_total_a = sum(v for v in a.values() if v > 0)
        slow_total_b = sum(v for v in b.values() if v > 0)
        print(f"aging ratio last/first: {slow_total_b / slow_total_a:.3f}")
    first, last = snaps[0], snaps[-1]
    for k in sorted(first):
        if k in ("pass", "query", "sec"):
            continue
        print(f"  {k}: {first[k]} -> {last[k]}")
    spark.stop()


if __name__ == "__main__":
    main()
