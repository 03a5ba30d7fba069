"""Similarity search: brute-force top-k vs numpy oracle; IVF recall."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_export_tool_python_spark.operators.similarity import IVFIndex, brute_force_topk

EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB).cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def _numpy_topk(m, qidx, k):
    normed = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = normed[qidx] @ normed.T
    out = {}
    for row, qi in enumerate(qidx):
        s = sims[row].copy()
        s[qi] = -np.inf
        # ties broken by vec_id asc, matching the operator
        idx = np.lexsort((np.arange(len(s)), -s))[:k]
        out[qi] = list(idx)
    return out


def test_brute_force_matches_numpy(spark, emb, emb_np):
    ids, m = emb_np
    queries = emb.where(F.col("vec_id") < 20)
    got = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine"]))
    oracle = _numpy_topk(m, list(range(20)), 5)
    for q in range(20):
        mine = [v for _, v, _ in sorted(got[q])]
        assert mine == oracle[q], (q, mine, oracle[q])


def test_ivf_recall(spark, emb, emb_np):
    ids, m = emb_np
    idx = IVFIndex.fit(emb, n_lists=8)
    indexed = idx.assign_lists(emb).cache()
    # every vector got exactly one list
    assert indexed.where(F.col("list_id").isNull()).count() == 0
    n_lists = indexed.select("list_id").distinct().count()
    assert 2 <= n_lists <= 8

    queries = emb.where(F.col("vec_id") < 30)
    got = {}
    for r in idx.topk(indexed, queries, k=5, n_probe=4).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    oracle = _numpy_topk(m, list(range(30)), 5)
    hits = sum(len(got.get(q, set()) & set(oracle[q])) for q in range(30))
    recall = hits / (30 * 5)
    assert recall >= 0.7, recall  # 4/8 lists probed → recall well above 0.7
