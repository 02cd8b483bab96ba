"""Distributed k-means over an embedding column (corpus clustering /
IVF coarse-quantizer training; beyond the reference surface).

The classic scalable shape (Lloyd's algorithm, map-reduce form):

- centroids are tiny (k × dim floats) → shipped to executors inside the
  Arrow-serialized closure each iteration (a broadcast variable at
  cluster scale);
- each iteration is ONE mapInPandas pass that reduces every partition
  to a (k × dim sums, k counts) partial — numpy matrix math per Arrow
  batch, nothing row-at-a-time;
- partials (numExecutors × k rows, driver-sized) are combined on the
  driver; empty clusters keep their previous centroid;
- the final assignment pass is map-only.

Determinism: init takes the k lowest-id vectors (no RNG), iteration
count is fixed, and float accumulation happens in float64 with a
column-order-stable sum, so repeated runs agree. The per-iteration
collect is O(k·dim·partitions) — independent of corpus size; 100 TB of
vectors stream through each pass without any shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid index per row (squared L2 via the expanded
    form — one GEMM instead of a k-way broadcast subtract)."""
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * mat @ cents.T
        + (cents * cents).sum(axis=1)
    )
    return np.argmin(d2, axis=1)


def kmeans(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, np.ndarray]:
    """Returns (assignments DataFrame, final centroids).

    Assignment schema: (id_col, cluster int, dist double) with dist the
    6dp-rounded L2 distance to the assigned centroid."""
    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    init = (
        src.orderBy("id").limit(k).select("vec").collect()
    )  # k rows — driver-sized seed, deterministic (lowest ids)
    if len(init) < k:
        raise ValueError(
            f"kmeans needs at least k={k} rows, got {len(init)} — "
            "fewer rows than clusters has no valid seeding"
        )
    cents = np.array([r.vec for r in init], dtype="float64")

    partial_schema = "cluster long, cnt long, sums array<double>"
    for _ in range(n_iter):
        c = cents  # bind current value into the closure

        def partials(it, cents_=c):
            for pdf in it:
                if not len(pdf):
                    continue
                mat = np.stack(pdf["vec"].to_numpy()).astype("float64")
                lab = _assign(mat, cents_)
                rows = []
                for j in np.unique(lab):
                    sel = mat[lab == j]
                    rows.append(
                        {
                            "cluster": int(j),
                            "cnt": int(sel.shape[0]),
                            "sums": sel.sum(axis=0).tolist(),
                        }
                    )
                yield pd.DataFrame(rows)

        agg = src.select("vec").mapInPandas(partials, partial_schema).collect()
        sums = np.zeros_like(cents)
        cnts = np.zeros(k, dtype="int64")
        for r in sorted(agg, key=lambda r: r.cluster):
            sums[r.cluster] += np.asarray(r.sums)
            cnts[r.cluster] += r.cnt
        nonempty = cnts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / cnts[nonempty, None]

    cfinal = cents

    def assign_rows(it):
        for pdf in it:
            if not len(pdf):
                continue
            mat = np.stack(pdf["vec"].to_numpy()).astype("float64")
            lab = _assign(mat, cfinal)
            dist = np.linalg.norm(mat - cfinal[lab], axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cluster": lab.astype("int32"),
                    "dist": np.round(dist, 6),
                }
            )

    out = src.mapInPandas(assign_rows, "id long, cluster int, dist double")
    return out.withColumnRenamed("id", id_col), cents


def kmeans_assignments(
    df: DataFrame, k: int = 8, n_iter: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Query-registry wrapper: assignments only."""
    return kmeans(df, k=k, n_iter=n_iter, id_col=id_col, vec_col=vec_col)[0]
