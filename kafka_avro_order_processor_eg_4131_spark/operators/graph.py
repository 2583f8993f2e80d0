"""Level-synchronous BFS over a pair graph — the frontier-dedup loop
(the connected-components pattern): per level, one equi-join from the
frontier into the edge set, one distinct, one anti-join against the
visited set. Path counts NEVER exceed the node count per level, unlike
a UNION ALL random-walk expansion whose path count grows ~avg_degree^h
with depth (round-2 verdict #3 — the recursive-CTE walk stays as the
ORACLE formulation; this loop is the registered scale path).

Each level's frontier is localCheckpoint-ed: the loop would otherwise
replay every prior level's joins per reference (iterative-lineage
blowup), and the early-exit probe is an aggregate count, not a collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_hops(
    edges: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, hops) for every node within ``max_hops`` of the seed (the
    minimum ``src`` in ``edges`` — a 1-row aggregate relation, no
    driver collect). ``edges`` should be directed pairs (undirected
    graphs pass both directions) and MATERIALIZED by the caller
    (localCheckpoint) — every level re-reads it.

    hops = minimum hop distance by construction: a node enters the
    visited set the FIRST level it is reachable, and the anti-join
    keeps later rediscoveries out."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    frontier = (
        e.agg(F.min("src").alias("node"))
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=True)
    )
    visited = frontier
    for h in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.select(F.col("node").alias("src")), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(h))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=True)
        frontier = nxt
    return visited
