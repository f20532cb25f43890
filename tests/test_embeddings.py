"""Random-projection reduction and vector normalization: numpy parity,
JL distortion bound, ANN-stack composability."""

from __future__ import annotations

import numpy as np

from datapump_spark.operators.embeddings import (
    normalize_vecs,
    projection_matrix,
    reduce_dims,
)


def _load(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_reduce_matches_numpy(spark, sf_dir):
    emb = _load(spark, sf_dir)
    got = {r["vec_id"]: np.array(r["embedding"])
           for r in reduce_dims(emb, out_dim=16, seed=7).collect()}
    raw = {r["vec_id"]: np.array(r["embedding"])
           for r in emb.collect()}
    m = projection_matrix(64, 16, seed=7)
    for vid, v in raw.items():
        want = (v.astype("float64") @ m).astype("float32")
        assert np.allclose(got[vid], want, atol=1e-6), vid


def test_reduce_keeps_other_columns(spark, sf_dir):
    emb = _load(spark, sf_dir)
    red = reduce_dims(emb, out_dim=8)
    assert set(red.columns) == set(emb.columns)
    assert red.count() == emb.count()
    assert len(red.select("embedding").first()[0]) == 8


def test_jl_distortion_bound(spark, sf_dir):
    """Pairwise squared distances survive projection to 24 dims within
    loose relative distortion for the bulk of pairs (JL lemma, ε≈1/√k)."""
    emb = _load(spark, sf_dir)
    raw = np.array([r["embedding"] for r in
                    emb.orderBy("vec_id").limit(80).collect()], dtype="float64")
    red_rows = reduce_dims(emb, out_dim=24, seed=3) \
        .orderBy("vec_id").limit(80).collect()
    red = np.array([r["embedding"] for r in red_rows], dtype="float64")
    d_raw = ((raw[:, None, :] - raw[None, :, :]) ** 2).sum(-1)
    d_red = ((red[:, None, :] - red[None, :, :]) ** 2).sum(-1)
    mask = d_raw > 1e-9
    ratio = d_red[mask] / d_raw[mask]
    assert np.median(ratio) == np.clip(np.median(ratio), 0.6, 1.4)
    assert (np.abs(ratio - 1) < 0.8).mean() > 0.9


def test_normalize_vecs(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 0.0])],
        "vec_id bigint, embedding array<float>")
    rows = {r["vec_id"]: r["embedding"]
            for r in normalize_vecs(df).collect()}
    assert np.allclose(rows[1], [0.6, 0.8], atol=1e-6)
    assert rows[2] == [0.0, 0.0]          # zero vector untouched
    assert np.allclose(rows[3], [-1.0, 0.0], atol=1e-6)


def test_reduced_vectors_feed_ann_stack(spark, sf_dir):
    """cosine_topk over projected vectors still finds mostly the same
    neighbors as over the originals (sanity of the compress-then-search
    path)."""
    from datapump_spark.operators.similarity import cosine_topk

    emb = _load(spark, sf_dir)
    exact = cosine_topk(emb, k=10, query_max_id=3)
    red = reduce_dims(emb, out_dim=32, seed=5)
    # recall@10-in-top-40: the projected space is a candidate generator
    # (re-rank with full vectors in production), so grade containment in a
    # wider candidate set, not rank-for-rank agreement — these synthetic
    # embeddings are near-isotropic, the hardest case for JL ranking.
    approx = cosine_topk(red, k=40, query_max_id=3)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) >= 0.5
