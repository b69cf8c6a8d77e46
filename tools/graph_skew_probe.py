"""Adversarial skewed-graph probe for the triangle wedge join.

A hub of degree d is the triangle enumerator's worst case: pivoting
wedges at vertex ids emits C(d, 2) pairs from the hub into ONE shuffle
partition (2e8 rows at d = 20k), while degree orientation pivots every
wedge at the LOWER-degree endpoint, so the hub (highest degree) never
pivots and its leaves (degree <= 3 here) emit O(1) wedges each — total
wedge count linear in edges on this family, independent of hub degree.

Graph: one hub 0 connected to n leaves; leaves additionally ring-linked
in pairs (1-2, 3-4, ...) so the graph has n/2 real triangles through the
hub (the closing join stays non-trivial).

Usage: python tools/graph_skew_probe.py [n_small] [n_large]
Prints wall seconds at both hub sizes and the count, plus the logical
wedge totals under both orientations for the table in ARCHITECTURE.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from incubator_flink_spark import get_spark
from incubator_flink_spark.operators.graph import triangles


def hub_graph(spark, n: int):
    hub = spark.range(1, n + 1).selectExpr("CAST(0 AS LONG) AS src", "id AS dst")
    rim = (
        spark.range(1, n, 2)
        .where(f"id + 1 <= {n}")
        .selectExpr("id AS src", "id + 1 AS dst")
    )
    return hub.unionAll(rim)


def main():
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    n_large = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("graph-skew-probe")
    for n in (n_small, n_large):
        g = hub_graph(spark, n)
        triangles(g).count()  # warm codegen
        t0 = time.time()
        cnt = triangles(g).count()
        dt = time.time() - t0
        naive_wedges = n * (n - 1) // 2  # hub pivots under id ordering
        print(
            f"hub_degree={n:>7d}  triangles={cnt:>7d}  wall={dt:6.2f}s  "
            f"wedges(degree-oriented)≈{3 * (n // 2)}  wedges(naive id order)={naive_wedges}"
        )


if __name__ == "__main__":
    main()
