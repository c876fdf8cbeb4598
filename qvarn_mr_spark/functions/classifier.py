"""Model-based document filtering — the learned quality/domain gate.

Real pipelines put a lightweight classifier between the heuristic gates
and the dedup pass (GPT-3's LR quality filter over web text, CCNet's
fasttext domain buckets). The 100 TB shape has two halves:

- **training is sample-sized**: a deterministic hash-sample (no RNG,
  retry-stable — :func:`qvarn_mr_spark.functions.sampling`) feeds a
  logistic-regression fit whose per-iteration cost is ONE aggregate over
  the sample producing k+1 doubles — the corpus is never scanned in the
  loop;
- **scoring is free at scan time**: the fitted weights become a pure JVM
  Column expression (``sigmoid(w·x + b)`` over the same feature
  expressions), so the filter runs inside whole-stage codegen with no
  Python, no shuffle, no model server.

Features are bounded, engine-native signals (token/punct/stopword ratios
and the language marker-hit rates from :mod:`functions.text`), so the
fit is scale-free and the score expression is portable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from qvarn_mr_spark.functions.text import (
    LANG_MARKERS,
    marker_hits,
    punct_ratio,
    stopword_ratio,
    token_count,
)


def feature_exprs(text_col: str = "text") -> dict[str, Column]:
    """Bounded [0, 1]-ish feature Columns for document classification —
    all single-pass JVM expressions (narrow at any scale)."""
    toks = token_count(text_col)
    safe = F.greatest(toks, F.lit(1)).cast("double")
    feats: dict[str, Column] = {
        "len_score": F.least(toks.cast("double") / 100.0, F.lit(1.0)),
        "punct": punct_ratio(text_col),
        "stopword": stopword_ratio(text_col),
    }
    for lang, words in LANG_MARKERS.items():
        feats[f"hits_{lang}"] = F.least(
            marker_hits(text_col, words).cast("double") / safe, F.lit(1.0))
    return feats


def train_logreg(df: DataFrame, label: Column,
                 features: dict[str, Column] | None = None,
                 text_col: str = "text", iters: int = 60,
                 lr: float = 2.0, l2: float = 1e-4,
                 collect_threshold: int = 200_000) -> dict[str, float]:
    """Fit logistic regression by full-batch gradient descent.

    ``df`` should already be the (sample-sized) training set — pair with
    :func:`qvarn_mr_spark.functions.sampling.deterministic_sample` so
    retraining is reproducible and the corpus stays out of the loop.

    Spark featurizes (the text never reaches the driver); the GD loop
    then runs in one of two places:

    - sample ≤ ``collect_threshold`` rows (the normal case — a quality
      classifier trains on 10⁴-10⁶ labeled rows, k doubles each): the
      featurized matrix Arrow-collects ONCE and the loop is numpy — no
      per-iteration job scheduling, identical math;
    - bigger samples: the distributed loop — each iteration is one hash
      aggregate emitting the k+1-double gradient to the driver; the
      persisted featurized frame is re-scanned, never the text.

    Returns ``{feature: weight, "_bias": b}`` in RAW feature space.
    """
    if features is not None:
        feats = features
        names = sorted(feats)
        # one defined NULL semantic for BOTH paths: a NULL feature reads
        # as 0.0 (the local numpy loop would otherwise turn None into NaN
        # and poison every weight, while the distributed F.avg/F.sum
        # silently skip NULLs — two different answers); NULL-label rows
        # are unlabeled and dropped outright
        x = df.select(label.cast("double").alias("_y"),
                      *[F.coalesce(feats[n], F.lit(0.0)).alias(n)
                        for n in names]).where(F.col("_y").isNotNull())
    else:
        x, names = _staged_features(df, label, text_col)
    # probe-by-collect: fetching threshold+1 rows decides the path AND,
    # in the normal sample-sized case, already IS the whole featurized
    # matrix — one Spark job instead of a count() pass plus a collect
    # pass (this halved the fit's construct cost at sf0.1)
    head = x.limit(collect_threshold + 1).toPandas()
    if len(head) <= collect_threshold:
        return _gd_local(head, names, iters, lr, l2)
    x = x.persist()
    try:
        n = x.count() or 1
        # standardize once (one aggregate): full-batch GD on raw
        # [0, 0.x]-scale features crawls; on unit-variance features it
        # converges in tens of steps. Weights are mapped back to RAW
        # feature space before returning, so score_expr needs no stats.
        srow = x.agg(*[F.avg(nm).alias(f"_m_{nm}") for nm in names],
                     *[F.stddev_pop(nm).alias(f"_s_{nm}")
                       for nm in names]).collect()[0]
        mu = {nm: float(srow[f"_m_{nm}"] or 0.0) for nm in names}
        sd = {nm: max(float(srow[f"_s_{nm}"] or 0.0), 1e-9)
              for nm in names}
        w = {name: 0.0 for name in names}
        b = 0.0
        for _ in range(iters):
            z = F.lit(b)
            for name in names:
                z = z + F.lit(w[name]) * (
                    (F.col(name) - F.lit(mu[name])) / F.lit(sd[name]))
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
            err = (p - F.col("_y")).alias("_e")
            row = x.select(err, *[
                ((F.col(nm) - F.lit(mu[nm])) / F.lit(sd[nm])).alias(nm)
                for nm in names]).agg(
                F.sum("_e").alias("_gb"),
                *[F.sum(F.col("_e") * F.col(nm)).alias(f"_g_{nm}")
                  for nm in names]).collect()[0]
            b -= lr * float(row["_gb"]) / n
            for name in names:
                g = float(row[f"_g_{name}"]) / n + l2 * w[name]
                w[name] -= lr * g
        out = {name: w[name] / sd[name] for name in names}
        out["_bias"] = b - sum(w[name] * mu[name] / sd[name]
                               for name in names)
        return out
    finally:
        x.unpersist()


def _feature_frame(df: DataFrame, text_col: str, keep):
    """Stages 1-3 of the default featurization, the ``profile_frame`` way:
    normalize once, per-language marker sums as intermediate columns,
    features assembled from cheap refs. A single flat ``select`` of
    :func:`feature_exprs` inlines ``_normalized_for_words`` into every
    one of the ~70 marker counts and its Catalyst analysis alone cost
    seconds per construction; the staged projections survive
    CollapseProject (SPARK-36718) and analyze in milliseconds with
    bit-identical values. ``keep`` — extra Columns carried through
    (training label, score-time id columns) as a {name: Column} mapping.
    Returns (frame, names): frame has the kept columns plus one column
    per feature name."""
    from qvarn_mr_spark.functions.text import (
        EN_STOPWORDS,
        _count_occurrences,
        _normalized_for_words,
        punct_ratio,
    )

    c = F.col(text_col)
    st1 = df.select(*[col.alias(name) for name, col in keep.items()],
                    c.alias("_text"),
                    _normalized_for_words(c).alias("_norm"))
    kept = list(keep)
    norm, txt = F.col("_norm"), F.col("_text")

    def hits(words):
        total = None
        for w in words:
            h = _count_occurrences(norm, w)
            total = h if total is None else total + h
        return total

    st2 = st1.select(
        *kept,
        *[hits(words).alias(f"_h_{lang}")
          for lang, words in LANG_MARKERS.items()],
        hits(EN_STOPWORDS).alias("_h_stop"),
        token_count(txt).alias("_toks"),
        punct_ratio(txt).alias("_punct"),
    )
    toks = F.col("_toks")
    safe = F.greatest(toks, F.lit(1)).cast("double")
    feats: dict[str, Column] = {
        "len_score": F.least(toks.cast("double") / 100.0, F.lit(1.0)),
        "punct": F.col("_punct"),
        "stopword": F.when(toks == 0, F.lit(0.0)).otherwise(
            F.least(F.col("_h_stop").cast("double") / toks, F.lit(1.0))),
    }
    for lang in LANG_MARKERS:
        feats[f"hits_{lang}"] = F.least(
            F.col(f"_h_{lang}").cast("double") / safe, F.lit(1.0))
    names = sorted(feats)
    st3 = st2.select(*kept,
                     *[F.coalesce(feats[n], F.lit(0.0)).alias(n)
                       for n in names])
    return st3, names


def _staged_features(df: DataFrame, label: Column, text_col: str):
    """Training frame via :func:`_feature_frame`. NULL semantics match
    the generic custom-features path: NULL features coalesce to 0.0,
    NULL-label rows are unlabeled and drop."""
    frame, names = _feature_frame(
        df, text_col, {"_y": label.cast("double")})
    return frame.where(F.col("_y").isNotNull()), names


def score_frame(df: DataFrame, weights: dict[str, float],
                id_cols=("doc_id",), text_col: str = "text",
                score_col: str = "score", digits: int = 6,
                threshold: float | None = None) -> DataFrame:
    """Staged twin of :func:`score_expr` for scoring a whole frame:
    ``(ids…, score[, kept])`` built through the same staged projections
    as training, so constructing the scoring query costs milliseconds of
    analysis instead of seconds. Values are bit-identical to
    ``df.select(score_expr(w))`` — same feature expressions, same
    ``sigmoid(w·x + b)``; :func:`score_expr` remains the portable
    single-Column form."""
    frame, names = _feature_frame(
        df, text_col, {c: F.col(c) for c in id_cols})
    z = F.lit(weights.get("_bias", 0.0))
    for name in names:
        if name in weights:
            z = z + F.lit(weights[name]) * F.col(name)
    s = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("_s")
    out = frame.select(*id_cols, s)
    cols = [*id_cols, F.round(F.col("_s"), digits).alias(score_col)]
    if threshold is not None:
        cols.append((F.col("_s") >= threshold).alias("kept"))
    return out.select(*cols)


def _gd_local(pdf, names: list[str], iters: int, lr: float,
              l2: float) -> dict[str, float]:
    """Driver-side twin of the distributed GD loop — same standardize /
    gradient / weight-unmap sequence over the already-Arrow-collected
    featurized matrix (k doubles per row, sample-sized by the caller's
    contract). NULLs were coalesced to 0.0 at featurization; the fillna
    is belt-and-braces for direct callers."""
    import numpy as np

    pdf = pdf.fillna({nm: 0.0 for nm in names})
    y = pdf["_y"].to_numpy(dtype=float)
    mat = pdf[names].to_numpy(dtype=float)
    n = max(len(y), 1)
    mu = mat.mean(axis=0) if len(y) else np.zeros(len(names))
    sd = np.maximum(mat.std(axis=0) if len(y) else np.zeros(len(names)),
                    1e-9)
    xs = (mat - mu) / sd
    w = np.zeros(len(names))
    b = 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w + b)))
        e = p - y
        b -= lr * float(e.sum()) / n
        w -= lr * (xs.T @ e / n + l2 * w)
    out = {nm: float(w[i] / sd[i]) for i, nm in enumerate(names)}
    out["_bias"] = float(b - (w * mu / sd).sum())
    return out


def score_expr(weights: dict[str, float],
               features: dict[str, Column] | None = None,
               text_col: str = "text") -> Column:
    """The fitted model as a pure Column: ``sigmoid(w·x + b)`` over the
    same feature expressions — scoring a 100 TB corpus is scan-stage
    work, no Python anywhere."""
    feats = features if features is not None else feature_exprs(text_col)
    z = F.lit(weights.get("_bias", 0.0))
    for name, col in feats.items():
        if name in weights:
            z = z + F.lit(weights[name]) * col
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classifier_filter(df: DataFrame, weights: dict[str, float],
                      threshold: float = 0.5,
                      text_col: str = "text",
                      score_col: str | None = None) -> DataFrame:
    """Keep rows the model scores above ``threshold`` — the learned gate
    a pipeline drops between the heuristic filters and dedup. Optionally
    materializes the score column."""
    s = score_expr(weights, text_col=text_col)
    out = df.filter(s >= threshold)
    if score_col:
        out = out.withColumn(score_col, F.round(s, 6))
    return out


def train_accuracy(df: DataFrame, label: Column,
                   weights: dict[str, float],
                   text_col: str = "text") -> float:
    """Held-out accuracy of the fitted model (one aggregate)."""
    s = score_expr(weights, text_col=text_col)
    row = df.select(
        ((s >= 0.5).cast("int") == label.cast("int"))
        .cast("double").alias("_ok")).agg(F.avg("_ok")).collect()[0]
    return float(row[0] or 0.0)


def sigmoid(z: float) -> float:
    """Driver-side twin of the score expression (tests)."""
    return 1.0 / (1.0 + math.exp(-z))
