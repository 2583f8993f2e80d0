"""Hot-key SKEW fixture builder (round-9 verdict item 4).

Derives a skewed variant of any fixture dir with three dominant keys,
deterministically (pure key arithmetic, no hashing):

- events: 50% of all events (event_id % 2 = 0) remapped to the minimum
  user_id -> one user owns half the stream (sessionization / per-user
  window stress);
- lineitem: ~30% of rows ((l_orderkey*8 + l_linenumber) % 10 < 3)
  remapped to the minimum p_partkey -> one part in ~28.5% of lineitem
  (the skew_salted_join_lineitem_part shape);
- lineitem: ~0.34% of rows (l_orderkey % 293 = 7) remapped to the
  minimum o_orderkey (linenumbers re-encoded 1000+ROW_NUMBER to keep
  the (orderkey, linenumber) composite unique) -> one order ~300x the
  typical size.

The hot ORDER is DELIBERATELY bounded rather than the headline 30%:
per-order part-PAIR outputs (copurchase lift) are quadratic in order
size, so a 30%-hot order makes the correct ANSWER explode (~1.6e8
pair rows already at sf0.01) — that measures output volume, not plan
skew. The 30% dominance rides the PARTKEY channel instead, whose
consumers are all linear per key.

Tables are written as <name>.parquet/ directories (one part file) so
the parity harness's ``<t>.parquet/*.parquet`` glob works; unchanged
tables are copied through. Usage:

    python tests/skew_fixture.py <src_dir> <out_dir>
"""

from __future__ import annotations

import os
import shutil


def _src_path(src: str, t: str) -> str:
    p = f"{src}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def build_skew_fixture(src: str, out: str) -> dict[str, float]:
    """Build the skewed variant of ``src`` under ``out``; returns the
    measured hot-key shares per channel (for assertions/logs)."""
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def write(t: str, sql: str) -> None:
        d = f"{out}/{t}.parquet"
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        con.execute(f"COPY ({sql}) TO '{d}/part-0.parquet' (FORMAT PARQUET)")

    hot_user = con.execute(
        f"SELECT MIN(user_id) FROM read_parquet('{_src_path(src, 'events')}')"
    ).fetchone()[0]
    hot_part = con.execute(
        f"SELECT MIN(p_partkey) FROM read_parquet('{_src_path(src, 'part')}')"
    ).fetchone()[0]
    hot_order = con.execute(
        f"SELECT MIN(o_orderkey) FROM read_parquet('{_src_path(src, 'orders')}')"
    ).fetchone()[0]

    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "documents", "embeddings"):
        write(t, f"SELECT * FROM read_parquet('{_src_path(src, t)}')")

    write("events", f"""
      SELECT event_id, ts,
             CASE WHEN event_id % 2 = 0 THEN {hot_user} ELSE user_id END
               AS user_id,
             event_type, value, props
      FROM read_parquet('{_src_path(src, 'events')}')
    """)

    write("lineitem", f"""
      SELECT CASE WHEN l_orderkey % 293 = 7 THEN {hot_order}
                  ELSE l_orderkey END AS l_orderkey,
             CASE WHEN (l_orderkey * 8 + l_linenumber) % 10 < 3 THEN {hot_part}
                  ELSE l_partkey END AS l_partkey,
             l_suppkey,
             CAST(CASE WHEN l_orderkey % 293 = 7
                  THEN 1000 + ROW_NUMBER()
                       OVER (ORDER BY l_orderkey, l_linenumber)
                  ELSE l_linenumber END AS INT) AS l_linenumber,
             l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus, l_shipdate
      FROM read_parquet('{_src_path(src, 'lineitem')}')
    """)

    shares = {}
    for t, k in (("events", "user_id"), ("lineitem", "l_partkey"),
                 ("lineitem", "l_orderkey")):
        top = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet/*.parquet') "
            f"GROUP BY {k} ORDER BY 1 DESC LIMIT 1"
        ).fetchone()[0]
        tot = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet/*.parquet')"
        ).fetchone()[0]
        shares[f"{t}.{k}"] = top / tot
    con.close()
    return shares


if __name__ == "__main__":
    import sys

    print(build_skew_fixture(sys.argv[1], sys.argv[2]))
