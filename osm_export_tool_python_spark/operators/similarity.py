"""Similarity search over embedding columns.

  brute_force_topk — exact cosine top-k (baseline / oracle-checkable):
    broadcast the (small) query set, pure Column dot products, window
    top-k.  O(n·q) but embarrassingly parallel and shuffle-free until
    the final top-k.

  ivf_topk — the scale path: k-means-style coarse quantizer (fit on a
    sample, driver-side numpy), every vector assigned to its nearest
    centroid ("inverted list"); queries probe only the n_probe nearest
    lists.  Recall < 1.0 by construction; the probe count trades recall
    for the fraction of the table scanned — at 100 TB the scan hits
    ~n_probe/n_lists of the data and partitions prune on `list_id`.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_sim_col


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = None,
) -> DataFrame:
    """(query_id, vec_id, cosine, rank): exact top-k by cosine.
    `queries` must be small (it is broadcast)."""
    from ..parallel import fan_out

    qid = query_id_col or id_col
    q = queries.select(F.col(qid).alias("query_id"), F.col(vec_col).alias("qv"))
    v = fan_out(
        vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_sim_col(F.col("qv"), F.col("v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


class IVFIndex:
    """Driver-held coarse quantizer (numpy k-means on a sample)."""

    def __init__(self, centroids):
        self.centroids = np.asarray(centroids, dtype=np.float64)

    @classmethod
    def fit(cls, vectors: DataFrame, n_lists: int = 16, vec_col: str = "embedding",
            sample_rows: int = 2000, iters: int = 10, seed: int = 42):
        sample = np.array(
            [r[0] for r in vectors.select(vec_col).limit(sample_rows).collect()],
            dtype=np.float64,
        )
        sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
        rng = np.random.default_rng(seed)
        cent = sample[rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)]
        for _ in range(iters):
            sims = sample @ cent.T
            assign = sims.argmax(axis=1)
            for c in range(len(cent)):
                members = sample[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
        return cls(cent)

    def _assign_udf(self, spark, n_best: int):
        import pandas as pd

        globals()["pd"] = pd
        from pyspark.sql.functions import pandas_udf

        bc = spark.sparkContext.broadcast(self.centroids)

        @pandas_udf("array<int>")
        def assign(vecs: pd.Series) -> pd.Series:
            cent = bc.value
            m = np.stack(vecs.to_numpy()).astype(np.float64)
            m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
            sims = m @ cent.T
            idx = np.argsort(-sims, axis=1)[:, :n_best]
            return pd.Series([row.tolist() for row in idx])

        return assign

    def assign_lists(self, vectors: DataFrame, vec_col: str = "embedding") -> DataFrame:
        """Add `list_id` — at scale this is the partition/bucket column."""
        from ..parallel import fan_out

        vectors = fan_out(vectors)
        assign = self._assign_udf(vectors.sparkSession, 1)
        return vectors.withColumn(
            "list_id", F.try_element_at(assign(F.col(vec_col)), F.lit(1))
        )

    def topk(
        self,
        indexed: DataFrame,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 4,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ANN top-k: probe the n_probe nearest lists per query."""
        assign = self._assign_udf(indexed.sparkSession, n_probe)
        q = queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(assign(F.col(vec_col))).alias("list_id"),
        )
        v = indexed.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"), "list_id"
        )
        scored = (
            v.join(F.broadcast(q), "list_id")
            .where(F.col("query_id") != F.col("vec_id"))
            .select(
                "query_id", "vec_id", cosine_sim_col(F.col("qv"), F.col("v")).alias("cosine")
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("vec_id").asc()
        )
        return scored.withColumn("rank", F.row_number().over(w)).where(
            F.col("rank") <= k
        )
