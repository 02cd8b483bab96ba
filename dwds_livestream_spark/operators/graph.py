"""Graph analytics beyond connected components / PageRank: triangle
counting via degree-ordered edge orientation.

Beyond-reference operator (project brief: batch analytics layer). The
reference has no graph surface; this rounds out the iterative-graph
family (components.py, PageRank in plans/analytics.py) with the
classic clustering-coefficient building block.

Scale design (the Cohen / Suri-Vassilvitskii MapReduce algorithm):
counting wedges at every node explodes on hubs (a degree-d node makes
d² wedges). Orienting each undirected edge from the LOWER (degree,
node) endpoint to the higher caps every node's out-degree at
O(sqrt(|E|)) regardless of hubs — each triangle is then counted
exactly once, at its lowest-ordered vertex, and the wedge join's
fan-out is bounded by arboricity, not by max degree. Three shuffles
total: degree aggregate, wedge self-join on the pivot, closing-edge
join. The DuckDB oracle counts the same triangles with the id-ordered
3-way join — an independent formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Distinct undirected edges as (u, v) with u < v; self-loops
    dropped."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Total distinct triangles in the undirected graph. Output: one
    row, column ``n_triangles``."""
    e = canonical_edges(edges, src, dst)
    deg = (
        e.select(F.explode(F.array("u", "v")).alias("n"))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # total order on nodes: (degree, node); orient low -> high
    keyed = (
        e.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    d = keyed.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("x"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("y"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dy"),
    )
    # wedges at the lowest-ordered vertex: unordered out-neighbor pairs,
    # ordered between themselves by the SAME (degree, node) key so the
    # closing edge's orientation is known
    a = d.select("x", F.col("y").alias("y1"), F.col("dy").alias("d1"))
    b = d.select("x", F.col("y").alias("y2"), F.col("dy").alias("d2"))
    one_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("y1") < F.col("y2"))
    )
    wedges = a.join(b, "x").where(one_first).select(
        F.col("y1").alias("wx"), F.col("y2").alias("wy")
    )
    closed = wedges.join(
        d.select(F.col("x").alias("wx"), F.col("y").alias("wy")), ["wx", "wy"]
    )
    return closed.agg(F.count("*").alias("n_triangles"))


def node_degrees(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Per-node degree of the canonical undirected graph."""
    e = canonical_edges(edges, src, dst)
    return (
        e.select(F.explode(F.array("u", "v")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("int").alias("degree"))
    )
