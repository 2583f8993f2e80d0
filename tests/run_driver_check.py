"""Standalone replica of the driver's correctness gate. Run from ANY cwd:

    python /root/repo/tests/run_driver_check.py [sf_dir]

Loads __spark_entry__.py by file path (exactly like the driver), runs
entry() + every queries() entry vs its oracle_sql() through DuckDB, and
prints a one-line summary. Exit code 1 on any mismatch.
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys


def canon(df):
    cols = sorted(df.columns)

    def c(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NAN" if math.isnan(v) else v.hex()
        if isinstance(v, (list, tuple)) or "ndarray" in str(type(v)):
            return "[" + ",".join(c(x) for x in v) + "]"
        return repr(v)

    return sorted(tuple(c(df[col].iloc[i]) for col in cols) for i in range(len(df)))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    entry_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", entry_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from pyspark.sql import SparkSession

    import duckdb

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    rows = mod.entry(spark).collect()
    assert len(rows) > 0, "entry() smoke returned no rows"

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    from kafka_avro_order_processor_eg_4131_spark.operators import cache as C

    fails, rows_only = [], 0
    oracles = mod.oracle_sql()
    for name, fn in sorted(mod.queries().items()):
        sdf = fn(spark, sf_dir).toPandas()
        C.release_ephemeral()  # per-query persists done once toPandas returns
        o = oracles.get(name)
        if o is None:
            rows_only += 1
            continue
        odf = con.execute(o).fetch_df()
        if not (canon(sdf) == canon(odf) and sorted(sdf.columns) == sorted(odf.columns)):
            fails.append(name)
    print(
        f"queries: {len(mod.queries())} oracles: {len(oracles)} "
        f"rows-only: {rows_only} mismatches: {fails}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
