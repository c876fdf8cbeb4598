"""Embedding dimensionality reduction: one-pass PCA and a deterministic
Johnson-Lindenstrauss random projection.

Why it belongs in a curation engine: every similarity stage downstream
(IVF routing, LSH banding, SemDeDup domination, PQ codebooks —
functions/similarity.py) gets cheaper roughly linearly in dimension, and
at 100 TB the embedding column is often the widest thing in the corpus.
Projecting 1024-dim vectors to 64 before the LSH/IVF stages is standard
practice; both operators here keep the heavy side embarrassingly parallel.

- **PCA** (:func:`pca_fit` / :func:`pca_project`): the fit is ONE
  distributed pass — each partition emits ``(count, sum-vector, gram
  matrix)`` partials (Arrow-batched, numpy inside), the driver combines
  partition partials and eigendecomposes the d x d covariance. d is the
  embedding width (bounded by contract, like the IVF centroid and BPE
  vocab tables), so driver work is O(d^2) memory and O(d^3) eigh — never
  corpus-sized. Projection is a pure JVM expression per component
  (``aggregate(zip_with(...))`` dot product), scan-stage work with no
  shuffle; an Arrow matmul twin covers wide-k batches.
- **Random projection** (:func:`random_projection_matrix` /
  :func:`random_project`): the sparse-sign Achlioptas construction with a
  HASH-derived matrix — no RNG, no fit pass, no state to ship; any worker
  (or any SQL engine) can regenerate row j from ``md5(salt:i:j)``. The
  matrix is literal-inlined on both the Spark and oracle sides, so the
  operator is fully value-oracled without a committed-artifact sidecar.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------

def pca_fit(df: DataFrame, vec_col: str = "embedding", k: int = 4) -> dict:
    """One-pass covariance PCA. Returns ``{"mean": [d], "components":
    [k][d], "explained_var": [k]}`` with a deterministic sign convention
    (each component's largest-|x| coordinate is positive) so refits and
    oracles agree.

    Scale: the single corpus pass reduces to per-partition ``(n, sum,
    X^T X)`` partials — numpy inside an Arrow batch, numPartitions rows
    collected. Population covariance (divide by n); eigh on the driver's
    d x d matrix."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        n = 0
        s = None
        g = None
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if X.size == 0:
                continue
            n += X.shape[0]
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            gg = X.T @ X
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()],
                                "g": [g.ravel().tolist()]})

    parts = (df.select(vec_col)
               .mapInPandas(partials,
                            "n long, s array<double>, g array<double>")
               .toPandas())
    n = int(parts["n"].sum())
    if n == 0:
        raise ValueError("pca_fit: empty input")
    s = np.sum([np.asarray(v) for v in parts["s"]], axis=0)
    g = np.sum([np.asarray(v) for v in parts["g"]], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = g.reshape(d, d) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for idx in order:
        v = evecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append(v.tolist())
    return {"mean": mean.tolist(), "components": comps,
            "explained_var": [float(evals[i]) for i in order]}


def pca_project(df: DataFrame, model: dict, vec_col: str = "embedding",
                id_col: str = "vec_id", digits: int | None = 6,
                prefix: str = "pc", whiten: bool = False) -> DataFrame:
    """Project onto the fitted components as pure JVM expressions:
    ``pc_i = dot(vec, c_i) - dot(mean, c_i)`` — the mean-side dot is a
    Python-computed literal, the vec-side dot is
    ``aggregate(zip_with(...))`` over the double-cast array. Scan-stage
    work: no shuffle, no Python in the row path.

    ``whiten``: divide each axis by sqrt(its eigenvalue), giving unit
    variance per output dimension (ZCA-without-rotation) — the usual
    pre-step before cosine/Euclidean machinery that assumes isotropy."""
    vec = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for i, comp in enumerate(model["components"]):
        c = F.array(*[F.lit(float(x)) for x in comp])
        dot = F.aggregate(F.zip_with(vec, c, lambda x, w: x * w),
                          F.lit(0.0), lambda a, x: a + x)
        proj = dot - F.lit(_dot(model["mean"], comp))
        if whiten:
            proj = proj / F.lit(math.sqrt(model["explained_var"][i]))
        if digits is not None:
            proj = F.round(proj, digits)
        cols.append(proj.alias(f"{prefix}{i}"))
    return df.select(*cols)


def pca_project_arrow(df: DataFrame, model: dict,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      digits: int | None = 6,
                      prefix: str = "pc") -> DataFrame:
    """Arrow twin of :func:`pca_project`: one ``(X - mean) @ C^T`` matmul
    per batch. Same contract and rounding — shares the oracle. Prefer it
    when k is large enough that k JVM fold-expressions lose to one BLAS
    call."""
    import numpy as np
    import pandas as pd

    mean = [float(x) for x in model["mean"]]
    comps = [[float(x) for x in c] for c in model["components"]]
    names = [f"{prefix}{i}" for i in range(len(comps))]

    def project(batches):
        M = np.asarray(mean)
        C = np.asarray(comps)
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            out = {id_col: pdf[id_col]}
            if len(pdf):
                # match the JVM form exactly: dot(vec, c) - dot(mean, c),
                # NOT dot(vec - mean, c) — same literals, same rounding
                P = X @ C.T - (M @ C.T)
                if digits is not None:
                    P = P.round(digits)
                for j, nm in enumerate(names):
                    out[nm] = P[:, j]
            else:
                for nm in names:
                    out[nm] = pd.Series([], dtype="float64")
            yield pd.DataFrame(out)

    id_type = dict(df.dtypes)[id_col]
    schema = f"{id_col} {id_type}, " + ", ".join(
        f"{nm} double" for nm in names)
    return df.select(id_col, vec_col).mapInPandas(project, schema)


def _dot(a, b) -> float:
    return float(sum(float(x) * float(y) for x, y in zip(a, b)))


# ---------------------------------------------------------------------------
# Random projection (Johnson-Lindenstrauss, hash-derived)
# ---------------------------------------------------------------------------

def random_projection_matrix(d: int, k: int,
                             salt: str = "rp") -> list[list[float]]:
    """Sparse-sign JL matrix (Achlioptas 2003): entry (i, j) is
    +sqrt(3/k), 0, or -sqrt(3/k) with probability 1/6, 2/3, 1/6 — drawn
    from ``md5(salt:i:j)``, so the matrix is a pure function of (d, k,
    salt): reproducible on any worker, any engine, any session, with no
    RNG state and nothing to broadcast but the salt."""
    scale = math.sqrt(3.0 / k)
    rows = []
    for i in range(k):
        row = []
        for j in range(d):
            h = int.from_bytes(
                hashlib.md5(f"{salt}:{i}:{j}".encode()).digest()[:8],
                "big")
            u = h % 6
            row.append(scale if u == 0 else (-scale if u == 1 else 0.0))
        rows.append(row)
    return rows


def random_project(df: DataFrame, d: int, k: int = 8,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   salt: str = "rp", digits: int | None = 6,
                   prefix: str = "rp") -> DataFrame:
    """Project to k dims with the hash-derived JL matrix — scan-stage JVM
    dot products, no fit pass, no shuffle. Distance preservation is
    probabilistic (JL lemma), determinism is exact."""
    M = random_projection_matrix(d, k, salt)
    vec = F.col(vec_col).cast("array<double>")
    cols = [F.col(id_col)]
    for i, row in enumerate(M):
        c = F.array(*[F.lit(x) for x in row])
        dot = F.aggregate(F.zip_with(vec, c, lambda x, w: x * w),
                          F.lit(0.0), lambda a, x: a + x)
        if digits is not None:
            dot = F.round(dot, digits)
        cols.append(dot.alias(f"{prefix}{i}"))
    return df.select(*cols)
