"""Fast oracle check for a subset of catalog queries. Usage:

    python /root/repo/tests/check_subset.py q1 q2 ...   [from any cwd]

Same canonicalization as run_driver_check.py but only the named
queries (or a comma-free prefix match with 'prefix*'). Exit 1 on any
mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_driver_check import canon  # noqa: E402  (same dir)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:]
    if not names:
        print("usage: check_subset.py <query> [...]")
        return 2

    import duckdb
    from pyspark.sql import SparkSession

    from kafka_avro_order_processor_eg_4131_spark.catalog import REGISTRY

    picked = []
    for n in names:
        if n.endswith("*"):
            picked += [q for q in sorted(REGISTRY) if q.startswith(n[:-1])]
        elif n in REGISTRY:
            picked.append(n)
        else:
            print(f"unknown query {n!r}")
            return 2

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    fails = []
    for name in picked:
        q = REGISTRY[name]
        sdf = q.fn(spark, sf_dir).toPandas()
        if q.oracle is None:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(q.oracle).fetch_df()
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_vals = ok_cols and canon(sdf) == canon(odf)
        print(
            f"{name}: {'OK' if ok_vals else 'MISMATCH'} "
            f"(spark {len(sdf)} rows, oracle {len(odf)} rows"
            f"{'' if ok_cols else ', COLS ' + str(sorted(sdf.columns)) + ' vs ' + str(sorted(odf.columns))})"
        )
        if not ok_vals:
            fails.append(name)
            if ok_cols and len(sdf) == len(odf):
                a, b = canon(sdf), canon(odf)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"  spark:  {x}")
                    print(f"  oracle: {y}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
