"""Dimensionality reduction (functions/reduction.py): PCA and JL.

The driver query value-oracles the projections; these tests pin what the
oracle can't — the FIT itself (vs a plain numpy PCA on the collected
matrix), the sign convention, variance ordering, twin equality, and the
JL matrix's determinism/shape guarantees.
"""

import math

import pytest
from pyspark.sql import functions as F

from qvarn_mr_spark.functions import reduction


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from qvarn_mr_spark.catalog import load_tables
    return load_tables(spark, sf_dir, tables=("embeddings",))["embeddings"]


@pytest.fixture(scope="module")
def model(emb):
    return reduction.pca_fit(emb, "embedding", k=3)


def test_fit_matches_numpy(emb, model):
    import numpy as np
    X = np.asarray([r["embedding"] for r in emb.collect()], dtype=np.float64)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    assert np.allclose(model["mean"], mean, atol=1e-9)
    for got_c, got_v, idx in zip(model["components"],
                                 model["explained_var"], order):
        v = evecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        assert np.allclose(got_c, v, atol=1e-7)
        assert got_v == pytest.approx(float(evals[idx]), rel=1e-9)


def test_explained_variance_descends_and_projection_var_matches(emb, model):
    import numpy as np
    ev = model["explained_var"]
    assert ev == sorted(ev, reverse=True)
    proj = reduction.pca_project(emb, model, digits=None).collect()
    P = np.asarray([[r[f"pc{i}"] for i in range(3)] for r in proj])
    # variance along each principal axis == its eigenvalue (population)
    got = P.var(axis=0)
    assert np.allclose(got, ev, rtol=1e-6)


def test_arrow_twin_matches_jvm(emb, model):
    a = sorted(map(tuple, reduction.pca_project(emb, model).collect()))
    b = sorted(map(tuple, reduction.pca_project_arrow(emb, model).collect()))
    assert a == b


def test_components_orthonormal(model):
    import numpy as np
    C = np.asarray(model["components"])
    assert np.allclose(C @ C.T, np.eye(len(C)), atol=1e-9)


def test_jl_matrix_deterministic_and_sparse():
    M1 = reduction.random_projection_matrix(64, 8, "rp")
    M2 = reduction.random_projection_matrix(64, 8, "rp")
    assert M1 == M2
    flat = [x for row in M1 for x in row]
    scale = math.sqrt(3.0 / 8)
    assert set(flat) <= {0.0, scale, -scale}
    # ~2/3 zeros by construction
    zeros = sum(1 for x in flat if x == 0.0)
    assert 0.5 < zeros / len(flat) < 0.8
    assert reduction.random_projection_matrix(64, 8, "other") != M1


def test_random_project_shape_and_determinism(emb):
    out = reduction.random_project(emb, d=64, k=4)
    rows = out.collect()
    assert out.columns == ["vec_id", "rp0", "rp1", "rp2", "rp3"]
    assert len(rows) == emb.count()
    again = reduction.random_project(emb, d=64, k=4).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pca_reconstruction_error_is_residual_eigenmass(emb, model):
    """The defining PCA optimality property: mean squared reconstruction
    error from the top-k projection equals the eigenvalue mass NOT
    captured (trace(cov) - sum of top-k eigenvalues)."""
    import numpy as np
    X = np.asarray([r["embedding"] for r in emb.collect()],
                   dtype=np.float64)
    mean = X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(mean, mean)
    C = np.asarray(model["components"])           # k x d, orthonormal
    P = (X - mean) @ C.T
    recon = mean + P @ C
    mse = float(np.mean(np.sum((X - recon) ** 2, axis=1)))
    residual = float(np.trace(cov)) - sum(model["explained_var"])
    assert mse == pytest.approx(residual, rel=1e-9)


def test_whitened_projection_has_unit_variance(emb, model):
    import numpy as np
    rows = reduction.pca_project(emb, model, digits=None,
                                 whiten=True).collect()
    P = np.asarray([[r[f"pc{i}"] for i in range(3)] for r in rows])
    assert np.allclose(P.var(axis=0), 1.0, rtol=1e-9)
