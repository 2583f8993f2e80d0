"""Scale-rehearsal harness (round-4 verdict item 4): run the heaviest
catalog queries at sf0.1 and at synthetic 2x/3x fixture dirs built by
unioning sf0.1 with key-shifted copies, and print a curvature table.
A super-linear t3/t1 is the cheapest local way to catch a hidden
quadratic before the driver does. Round-5 result: all 10 heaviest
queries <= 1.21x at 3x data (docs/PLANS.md "Round-5 scale rehearsal").

Usage (writes synthetic dirs under /tmp, never touches the repo or
/root/testdata):

    python /root/repo/tests/scale_rehearsal.py          # build + run
    python /root/repo/tests/scale_rehearsal.py --build-only

Key strides keep joins referentially consistent across copies
(orders.o_custkey moves with customer.c_custkey, etc.); region/nation
stay single-copy (lookup dims, duplicating would break their PKs).
Cross-copy documents are exact near-dups BY CONSTRUCTION, so the dedup
family's qualifying output grows ~copies^2 — a deliberately harsher
workload than a true larger corpus; flat runtime under it is
conservative evidence.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

SRC = "/root/testdata/sf0.1"
OUT = "/tmp/spark_graft_scale"

K_CUST = 10_000_000
K_ORD = 100_000_000
K_PART = 10_000_000
K_SUPP = 10_000_000
K_DOC = 10_000_000
K_VEC = 10_000_000
K_EVT = 100_000_000

SHIFTS = {
    "customer": {"c_custkey": K_CUST},
    "supplier": {"s_suppkey": K_SUPP},
    "part": {"p_partkey": K_PART},
    "orders": {"o_orderkey": K_ORD, "o_custkey": K_CUST},
    "lineitem": {"l_orderkey": K_ORD, "l_partkey": K_PART, "l_suppkey": K_SUPP},
    "events": {"event_id": K_EVT, "user_id": K_CUST},
    "documents": {"doc_id": K_DOC},
    "embeddings": {"vec_id": K_VEC},
}

HEAVY = [
    "dedup_embedding_cosine_pairs",
    "corpus_dedup_rate_by_source",
    "pagerank_copurchase_top20",
    "latency_pctiles_by_priority",
    "trend_theilsen_daily_revenue",
    "ann_ivf_kmeans_topk",
    "bpe_segment_stats",
    "dedup_family_agreement",
    "rfm_customer_segments",
    "session_max_concurrency",
]


def build(n_copies: int, out_dir: str) -> None:
    """Union SRC with (n_copies-1) key-shifted copies via DuckDB."""
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out_dir}/{t}.parquet")
    for t, shifts in SHIFTS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        selects = []
        for k in range(n_copies):
            proj = ", ".join(
                f"({c} + {shifts[c] * k}) AS {c}" if c in shifts else c
                for c in cols
            )
            selects.append(f"SELECT {proj} FROM read_parquet('{SRC}/{t}.parquet')")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    dirs = [("sf0.1", SRC)]
    for n in (2, 3):
        out = f"{OUT}/sfx0.{n}"
        if not os.path.exists(f"{out}/lineitem.parquet"):
            build(n, out)
            print(f"built {out}")
        dirs.append((f"sfx0.{n}", out))
    if "--build-only" in sys.argv:
        return 0

    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY
    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C
    from kafka_avro_order_processor_eg_4131_spark.session import get_spark

    spark = get_spark(app_name="scale-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[str, tuple[float, int]]] = {}
    for sf_name, sf_dir in dirs:
        C.release_all()
        for name in HEAVY:
            t0 = time.time()
            try:
                n_rows = REGISTRY[name].fn(spark, sf_dir).count()
                dt = time.time() - t0
            except Exception as e:  # noqa: BLE001 — report and keep sweeping
                n_rows, dt = -1, -1.0
                print(f"ERR {name} @ {sf_name}: {type(e).__name__}: {e}",
                      file=sys.stderr)
            C.release_ephemeral(spark)
            results.setdefault(name, {})[sf_name] = (dt, n_rows)
            print(f"{sf_name} {name}: {dt:.2f}s rows={n_rows}", flush=True)

    print("\n| query | " + " | ".join(n for n, _ in dirs) + " | t3/t1 | rows 1->3 |")
    print("|---" * (len(dirs) + 3) + "|")
    bad = 0
    for name in HEAVY:
        r = results[name]
        times = [r[n][0] for n, _ in dirs]
        t1, t3 = times[0], times[-1]
        ratio = t3 / t1 if t1 > 0 else float("nan")
        if ratio > 2.0:
            bad += 1
        cells = " | ".join(f"{t:.2f}" for t in times)
        print(
            f"| {name} | {cells} | {ratio:.2f} | "
            f"{r[dirs[0][0]][1]}->{r[dirs[-1][0]][1]} |"
        )
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
