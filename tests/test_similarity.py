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


def _lossless_vecs(spark, n=240):
    """8-dim vectors whose 2-dim subvectors draw from a ≤6-word
    integer vocabulary per subspace — the lossless-PQ regime: every
    subvector IS a codebook entry, all dot products are small
    integers (exact in IEEE), so ADC == uncompressed scoring."""
    k = F.col("id")
    cols = []
    for j in range(4):
        cols.append((k * (j + 1) % 3).cast("double"))
        cols.append(((k + j) % 2).cast("double"))
    return spark.range(n).select(
        k.alias("vec_id"), F.array(*cols).alias("embedding")
    )


def _ip_topk_oracle(mat, qidx, k):
    """Exact inner-product top-k (ties → vec_id asc), self excluded."""
    sims = mat[qidx] @ mat.T
    out = {}
    for row, qi in enumerate(qidx):
        s = sims[row].copy()
        s[qi] = -np.inf
        idx = np.lexsort((np.arange(len(s)), -s))[:k]
        out[qi] = list(idx)
    return out


def test_pq_lossless_equals_exact(spark):
    from osm_export_tool_python_spark.operators.similarity import PQIndex

    vecs = _lossless_vecs(spark)
    pq = PQIndex.fit_lossless(vecs, m=4)
    assert pq.dsub == 2 and pq.m == 4
    assert all(len(cb) <= 6 for cb in pq.codebooks)
    enc = pq.encode(vecs).cache()
    # encode is lossless: decoding every code reproduces the vector
    rows = enc.join(vecs, "vec_id").collect()
    for r in rows:
        dec = np.concatenate([pq.codebooks[j][c] for j, c in enumerate(r["codes"])])
        assert np.array_equal(dec, np.asarray(r["embedding"]))

    mat = np.array(
        [r["embedding"] for r in vecs.orderBy("vec_id").collect()], dtype=np.float64
    )
    queries = vecs.where(F.col("vec_id") < 10)
    got = {}
    for r in pq.topk(enc, queries, k=5).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["score"]))
    oracle = _ip_topk_oracle(mat, list(range(10)), 5)
    for q in range(10):
        mine = [v for _, v, _ in sorted(got[q])]
        assert mine == oracle[q], (q, mine, oracle[q])
        # integer-exact ADC scores
        for rank, v, s in got[q]:
            assert s == float(mat[q] @ mat[v])


def test_pq_scoring_stays_jvm_side(spark):
    """Plan gate: the ADC scoring join contains NO Python evaluation —
    the only Arrow crossing in the whole PQ pipeline is the encode."""
    from osm_export_tool_python_spark.operators.similarity import PQIndex

    vecs = _lossless_vecs(spark)
    pq = PQIndex.fit_lossless(vecs, m=4)
    enc = pq.encode(vecs)
    plan = pq.topk(enc, vecs.where(F.col("vec_id") < 3), k=3)._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan  # encode only
    assert "BatchEvalPython" not in plan


def test_pq_lossy_shortlist_rerank_on_embeddings(spark, emb, emb_np):
    """Real 64-dim embeddings, m=8 × 64 codes (32× smaller than the
    float vectors), used the way PQ is used in production: ADC ranks
    a 10·k shortlist, then EXACT cosine re-ranks just those
    candidates.  Random embeddings are PQ's worst case (no cluster
    structure — plain ADC@5 measures ~0.33 recall here), but the
    shortlist only has to CONTAIN the true neighbors (measured 0.86
    at 50/500 candidates); asserted as a 0.7 floor for sampling
    robustness.  Re-ranked scores must equal the exact cosine — the
    re-rank stage is lossless by construction."""
    from osm_export_tool_python_spark.operators.similarity import PQIndex

    ids, m = emb_np
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, v: acc + v.cast("double") ** 2
        )
    )
    unit = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double") / norm).alias("embedding"),
    ).cache()
    pq = PQIndex.fit(unit, m=8, n_codes=64, sample_rows=500)
    enc = pq.encode(unit)
    queries = unit.where(F.col("vec_id") < 30)
    got = {}
    normed = m / np.linalg.norm(m, axis=1, keepdims=True)
    for r in pq.topk(enc, queries, k=5, rerank_with=unit).collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
        # re-ranked score IS the exact cosine (tolerance: Column sum
        # order differs from BLAS)
        assert abs(r["score"] - float(normed[r["query_id"]] @ normed[r["vec_id"]])) < 1e-9
    oracle = _numpy_topk(m, list(range(30)), 5)
    hits = sum(len(got.get(q, set()) & set(oracle[q])) for q in range(30))
    recall = hits / (30 * 5)
    assert recall >= 0.7, recall


def test_ivf_pq_composition(spark, emb):
    """IVF-PQ: list assignment prunes the probe join (only probed
    list_ids are scored) and every returned id comes from a probed
    list; results are the PQ ranking restricted to those lists."""
    from osm_export_tool_python_spark.operators.similarity import IVFIndex, PQIndex

    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, v: acc + v.cast("double") ** 2
        )
    )
    unit = emb.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double") / norm).alias("embedding"),
    ).cache()
    ivf = IVFIndex.fit(unit, n_lists=8)
    indexed = ivf.assign_lists(unit)
    pq = PQIndex.fit(unit, m=8, n_codes=64, sample_rows=500)
    enc = pq.encode(indexed, keep=("list_id",)).cache()
    queries = unit.where(F.col("vec_id") < 10)
    out = pq.topk(enc, queries, k=5, ivf=ivf, list_col="list_id", n_probe=2).collect()
    assert {r["query_id"] for r in out} == set(range(10))
    # each query's hits live in its 2 probed lists only
    probe = {
        r["vec_id"]: set(r["lists"])
        for r in queries.select(
            "vec_id", ivf._assign_udf(spark, 2)(F.col("embedding")).alias("lists")
        ).collect()
    }
    lists = {r["vec_id"]: r["list_id"] for r in indexed.collect()}
    for r in out:
        assert lists[r["vec_id"]] in probe[r["query_id"]]


def test_pq_fit_empty_frame_raises(spark):
    from osm_export_tool_python_spark.operators.similarity import PQIndex

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        PQIndex.fit(empty)


def test_pq_cosine_metric_shortlist_keeps_true_neighbor(spark):
    """Metric consistency across the two-stage shape: with UNNORMALIZED
    vectors, raw-IP ranking systematically favors large-norm vectors —
    a shortlist ranked by IP but reranked by cosine can exclude the
    true cosine top-1 forever.  metric='cosine' scores BOTH stages as
    cosine (LUT/||q||, ADC/vnorm — exact in the lossless regime), so
    the true neighbor survives any shortlist size."""
    from osm_export_tool_python_spark.operators.similarity import PQIndex

    # corpus: id 1 is the exact cosine top-1 for q=(2,2) (cos=1.0) but
    # has the SMALLEST inner product; ids 2-7 are large-norm decoys
    corpus = [
        (1, [1.0, 1.0]),
        (2, [9.0, 0.0]), (3, [0.0, 9.0]),
        (4, [8.0, 1.0]), (5, [1.0, 8.0]),
        (6, [7.0, 2.0]), (7, [2.0, 7.0]),
    ]
    vecs = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(100, [2.0, 2.0])], "vec_id long, embedding array<double>")
    pq = PQIndex.fit_lossless(vecs, m=2)
    enc = pq.encode(vecs).cache()
    assert "vnorm" in enc.columns

    # two-stage, shortlist=3 < the 6 decoys: cosine metric keeps id 1
    got = pq.topk(enc, q, k=1, rerank_with=vecs, shortlist=3, metric="cosine").collect()
    assert [(r["query_id"], r["vec_id"]) for r in got] == [(100, 1)]
    assert abs(got[0]["score"] - 1.0) < 1e-12  # exact cosine of parallel vectors

    # single-stage cosine ADC == exact cosine ranking over all rows
    adc = pq.topk(enc, q, k=7, metric="cosine").collect()
    order = [r["vec_id"] for r in sorted(adc, key=lambda r: r["rank"])]
    embs = dict(corpus)
    qv = np.array([2.0, 2.0])
    cos = {
        i: float(qv @ np.array(v) / (np.linalg.norm(qv) * np.linalg.norm(v)))
        for i, v in embs.items()
    }
    want = sorted(embs, key=lambda i: (-cos[i], i))
    assert order == want

    # metric='ip' still means raw inner product end-to-end: both
    # stages agree, top-1 is a large-norm decoy by construction
    ip = pq.topk(enc, q, k=1, rerank_with=vecs, shortlist=3, metric="ip").collect()
    assert ip[0]["vec_id"] != 1
    assert abs(ip[0]["score"] - 18.0) < 1e-12  # exact dot product

    with pytest.raises(ValueError, match="metric"):
        pq.topk(enc, q, k=1, metric="euclid")
