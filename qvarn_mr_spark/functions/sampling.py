"""Deterministic sampling & split assignment for training-data pipelines.

A 100 TB corpus pipeline cannot use RNG sampling (``rand()``): retried tasks
would resample differently (breaking exactly-once semantics), reruns would
produce different corpora, and train/val/test membership must be stable as
the corpus grows. The standard remedy is **consistent hash sampling**: a
document's fate is a pure function of its id — ``u = h(salt || id) ∈ [0,1)``
— so membership is reproducible across runs, engines, and data layouts, and
independent samples are obtained by changing the salt.

Everything here is a narrow per-row projection (no shuffle, no UDF — plain
``md5``/``substring``/``locate`` expressions inside whole-stage codegen),
so it composes freely with scans and pushes through partition pruning.
The hash is md5 hex decoded by position-in-digit-string, the same portable
primitive as functions/dedup.py — which is what makes the DuckDB oracle
twins below possible (``sample_unit_sql`` is generated from the SAME
constants, so Spark and oracle can never drift).

The reference has no sampling surface at all; this is part of the
LLM-pipeline extension set (BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from qvarn_mr_spark.functions.dedup import HEX_DIGITS

#: Number of leading md5 hex digits used for the unit-interval hash.
#: 8 nibbles = 32 bits — plenty for fraction resolution, exact in a double.
UNIT_NIBBLES = 8
UNIT_DENOM = 16 ** UNIT_NIBBLES  # 2^32


def hash_unit(col: str, salt: str) -> Column:
    """Deterministic ``double`` in [0, 1): first 8 md5 hex nibbles of
    ``salt || '|' || value``, decoded in ONE ``conv(hex, 16, 10)`` (r13,
    guide §1.2 per-task work: the previous 8×(locate+substring) nibble
    loop decoded the same 32-bit value with ~24 string expressions per
    row; ``conv`` is the idiom ``dedup._minhash_base_col`` already
    proved bit-identical against the DuckDB strpos-per-nibble twin).
    Different salts give independent hashes of the same id. Takes a
    column NAME so call sites stay declarative."""
    if not isinstance(col, str):
        raise TypeError("hash_unit needs a column name")
    # coalesce: concat_ws silently drops NULL elements AND their separator
    # (md5('salt')), while the DuckDB twin's concat keeps the '|'
    # (md5('salt|')) — a NULL id would silently break hash parity. Pin both
    # sides to the empty string.
    val = F.expr(
        f"cast(conv(substring(md5(concat_ws('|', '{salt}', "
        f"coalesce(cast({col} as string), ''))), 1, {UNIT_NIBBLES}), "
        f"16, 10) as bigint)")
    return val / F.lit(float(UNIT_DENOM))


def sample_unit_sql(col: str, salt: str) -> str:
    """DuckDB twin of :func:`hash_unit` — generated from the same
    constants so both sides move together."""
    terms = " + ".join(
        f"(strpos('{HEX_DIGITS}', substring(md5(concat('{salt}', '|', "
        f"COALESCE(CAST({col} AS VARCHAR), ''))), {j + 1}, 1)) - 1) "
        f"* {16 ** (UNIT_NIBBLES - 1 - j)}"
        for j in range(UNIT_NIBBLES))
    return f"(({terms}) / {float(UNIT_DENOM)})"


def deterministic_sample(df: DataFrame, id_col: str, fraction: float,
                         salt: str = "sample") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by consistent hash of ``id_col``.
    Stable under reruns, retries, repartitioning, and corpus growth
    (a kept id stays kept); narrow (no shuffle)."""
    return df.filter(hash_unit(id_col, salt) < F.lit(float(fraction)))


def assign_split(df: DataFrame, id_col: str, weights: dict[str, float],
                 salt: str = "split",
                 out_col: str = "split") -> DataFrame:
    """Add a ``split`` column ('train'/'val'/'test'/…) by consistent hash:
    cumulative-weight thresholds over ``hash_unit``. Weights must sum to
    ~1; insertion order fixes the interval layout (dicts are ordered)."""
    total = sum(weights.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split weights must sum to 1, got {total}")
    u = hash_unit(id_col, salt)
    expr, acc = None, 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (F.lit(names[-1]) if expr is None
            else expr.otherwise(names[-1]))
    return df.withColumn(out_col, expr)


def assign_split_sql(id_col: str, weights: dict[str, float],
                     salt: str = "split") -> str:
    """DuckDB CASE twin of :func:`assign_split` (same cumulative layout)."""
    u = sample_unit_sql(id_col, salt)
    acc, whens = 0.0, []
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        whens.append(f"WHEN {u} < {acc} THEN '{name}'")
    return f"CASE {' '.join(whens)} ELSE '{names[-1]}' END"


def stratified_sample_sql(id_col: str, strata_col: str,
                          fractions: dict[str, float],
                          default: float = 0.0,
                          salt: str = "strata") -> str:
    """DuckDB WHERE-clause twin of :func:`stratified_sample` (same
    thresholds, same hash, same salt — generated from one dict so the two
    engines cannot drift)."""
    u = sample_unit_sql(id_col, salt)
    whens = " ".join(f"WHEN '{v}' THEN {float(f)}"
                     for v, f in fractions.items())
    return f"{u} < (CASE {strata_col} {whens} ELSE {float(default)} END)"


def stratified_sample(df: DataFrame, id_col: str, strata_col: str,
                      fractions: dict[str, float], default: float = 0.0,
                      salt: str = "strata") -> DataFrame:
    """Per-stratum consistent sampling (e.g. downweight a crawl source,
    keep all of a curated one): each stratum value gets its own keep
    fraction; unlisted strata get ``default``. The mixture-weighting
    primitive of corpus construction — still a narrow projection."""
    thr = None
    for value, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(value)
        thr = (F.when(cond, float(frac)) if thr is None
               else thr.when(cond, float(frac)))
    thr = F.lit(float(default)) if thr is None else thr.otherwise(
        float(default))
    return df.filter(hash_unit(id_col, salt) < thr)


def temperature_fractions(df: DataFrame, source_col: str, weight_col: str,
                          tau: float = 0.5,
                          budget_frac: float = 0.5) -> DataFrame:
    """Per-source keep fractions for temperature-``tau`` mixture sampling.

    The multilingual-pretraining standard (XLM-R-style): sample sources
    proportionally to ``T_s^tau`` (``T_s`` = source weight mass, e.g.
    tokens), flattening the head and boosting the tail as ``tau`` drops
    below 1. The keep fraction realizing mixture share ``q_s = T_s^tau/Z``
    under an overall ``budget_frac`` of total mass is
    ``min(1, budget_frac * N * q_s / T_s)``.

    Two metadata-sized aggregates (per-source totals, then a one-row
    normalizer) — the corpus itself is not shuffled. Fractions are rounded
    to 9 decimals so the DuckDB oracle can reproduce them bit-for-bit."""
    tot = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col).cast("double")).alias("_T"))
    z = tot.agg(F.sum(F.pow("_T", F.lit(float(tau)))).alias("_Z"),
                F.sum("_T").alias("_N"))
    return tot.crossJoin(F.broadcast(z)).select(
        source_col,
        F.round(F.least(
            F.lit(1.0),
            F.lit(float(budget_frac)) * F.col("_N")
            * F.pow("_T", F.lit(float(tau))) / F.col("_Z") / F.col("_T")),
            9).alias("keep_frac"))


def temperature_mix(df: DataFrame, id_col: str, source_col: str,
                    weight_col: str, tau: float = 0.5,
                    budget_frac: float = 0.5,
                    salt: str = "tmix") -> DataFrame:
    """Temperature-``tau`` mixture sample: keep each row iff its consistent
    hash falls under its source's :func:`temperature_fractions` threshold.

    The fraction table is |sources|-sized → broadcast join; the filter is
    then a narrow projection. Fully deterministic (no RNG): stable under
    retries, reruns, and corpus growth within a source."""
    fr = temperature_fractions(df, source_col, weight_col, tau, budget_frac)
    return (df.join(F.broadcast(fr), source_col)
            .filter(hash_unit(id_col, salt) < F.col("keep_frac"))
            .drop("keep_frac"))


def temperature_mix_sql(id_col: str, source_col: str, weight_expr: str,
                        tau: float = 0.5, budget_frac: float = 0.5,
                        salt: str = "tmix",
                        table: str = "documents") -> str:
    """DuckDB twin of :func:`temperature_mix` (same pow/round/threshold
    pipeline), aggregated per source: ``(source, n_docs, kept_weight)``.
    Weights must be integer-valued (token counts) so the double sums are
    exact and order-independent on both engines."""
    return f"""
WITH w AS (
  SELECT {id_col}, {source_col} AS src,
         CAST({weight_expr} AS DOUBLE) AS wt
  FROM {table}
),
tot AS (SELECT src, sum(wt) AS t FROM w GROUP BY 1),
z AS (SELECT sum(pow(t, {float(tau)})) AS zz, sum(t) AS n FROM tot),
fr AS (
  SELECT src, round(least(1.0, {float(budget_frac)} * n
                               * pow(t, {float(tau)}) / zz / t), 9) AS f
  FROM tot CROSS JOIN z
)
SELECT src AS {source_col}, count(*) AS n_docs,
       CAST(sum(wt) AS BIGINT) AS kept_weight
FROM w JOIN fr USING (src)
WHERE {sample_unit_sql(id_col, salt)} < f
GROUP BY 1
"""


def mixture_weight_search(df: DataFrame, id_col: str, source_col: str,
                          weight_col: str, taus,
                          budget_frac: float = 0.5,
                          salt: str = "tmix") -> DataFrame:
    """DoReMi-flavored mixture-weight search, engine-side: evaluate a
    GRID of temperature mixtures in ONE corpus pass and report, per
    ``(tau, source)``, the keep fraction, the target mixture share
    ``q_s = T_s^tau / Z_tau``, and the REALIZED kept mass/share under
    the same consistent-hash membership :func:`temperature_mix` uses —
    plus ``share_gap``, the |realized − target| miss. DoReMi proper
    learns domain weights with a proxy model; the engine-side primitive
    it (or any outer loop) needs is exactly this: cheap, deterministic
    evaluation of many candidate mixtures against the real corpus, so
    the owner picks the tau (or feeds the reported objective back into
    the next search round). No RNG anywhere — rerunning reproduces the
    same grid bit-for-bit.

    Scale shape: per-source totals are one metadata-sized aggregate; the
    (tau × source) fraction grid is tiny and broadcast; the single
    corpus-sized pass joins each row to its source's |taus| grid rows
    and partial-aggregates map-side, so the |taus|-fold fan-out never
    reaches the shuffle — only |taus|·|sources| partial rows do. Weights
    should be integer-valued (token counts) so sums are exact on any
    engine.

    Returns ``(tau, source, keep_frac, target_share, n_kept,
    kept_weight, realized_share, share_gap)`` — one row per grid point,
    sources with nothing kept included with zeros."""
    spark = df.sparkSession
    taus_df = spark.createDataFrame([(float(t),) for t in taus],
                                    "tau double")
    tot = df.groupBy(source_col).agg(
        F.sum(F.col(weight_col).cast("double")).alias("_T"))
    per_tau = (tot.crossJoin(taus_df)
               .select("tau", source_col, "_T",
                       F.pow("_T", F.col("tau")).alias("_Tt")))
    z = per_tau.groupBy("tau").agg(F.sum("_Tt").alias("_Z"),
                                   F.sum("_T").alias("_N"))
    grid = (per_tau.join(z, "tau")
            .select("tau", source_col,
                    F.round(F.col("_Tt") / F.col("_Z"), 9)
                    .alias("target_share"),
                    F.round(F.least(
                        F.lit(1.0),
                        F.lit(float(budget_frac)) * F.col("_N")
                        * F.col("_Tt") / F.col("_Z") / F.col("_T")), 9)
                    .alias("keep_frac")))
    rows = df.select(F.col(source_col),
                     F.col(weight_col).cast("double").alias("_wt"),
                     hash_unit(id_col, salt).alias("_u"))
    kept = (rows.join(F.broadcast(grid), source_col)
            .filter(F.col("_u") < F.col("keep_frac"))
            .groupBy("tau", source_col)
            .agg(F.count(F.lit(1)).alias("n_kept"),
                 F.sum("_wt").cast("long").alias("kept_weight")))
    out = (grid.join(kept, ["tau", source_col], "left")
           .select("tau", source_col, "keep_frac", "target_share",
                   F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                   F.coalesce("kept_weight", F.lit(0))
                   .alias("kept_weight")))
    tot_kept = out.groupBy("tau").agg(
        F.sum("kept_weight").alias("_kw"))
    return (out.join(F.broadcast(tot_kept), "tau")
            .select("tau", source_col, "keep_frac", "target_share",
                    "n_kept", "kept_weight",
                    F.round(F.when(F.col("_kw") > 0,
                                   F.col("kept_weight") / F.col("_kw"))
                            .otherwise(F.lit(0.0)), 6)
                    .alias("realized_share"))
            .withColumn("share_gap",
                        F.round(F.abs(F.col("realized_share")
                                      - F.col("target_share")), 6)))


def mixture_weight_search_sql(id_col: str, source_col: str,
                              weight_expr: str, taus,
                              budget_frac: float = 0.5,
                              salt: str = "tmix",
                              table: str = "documents") -> str:
    """DuckDB twin of :func:`mixture_weight_search` — same pow/round/
    threshold pipeline over a VALUES tau grid, integer-exact kept sums,
    6-dp shares."""
    values = ", ".join(f"({float(t)})" for t in taus)
    return f"""
WITH taus AS (
  SELECT CAST(v.tau AS DOUBLE) AS tau
  FROM (VALUES {values}) AS v(tau)
),
w AS (
  SELECT {id_col}, {source_col} AS src,
         CAST({weight_expr} AS DOUBLE) AS wt
  FROM {table}
),
tot AS (SELECT src, sum(wt) AS t FROM w GROUP BY 1),
pt AS (SELECT tau, src, t, pow(t, tau) AS tt FROM tot CROSS JOIN taus),
z AS (SELECT tau, sum(tt) AS zz, sum(t) AS n FROM pt GROUP BY 1),
grid AS (
  SELECT pt.tau, pt.src,
         round(pt.tt / z.zz, 9) AS target_share,
         round(least(1.0, {float(budget_frac)} * z.n
                          * pt.tt / z.zz / pt.t), 9) AS keep_frac
  FROM pt JOIN z USING (tau)
),
kept AS (
  SELECT g.tau, g.src, count(*) AS n_kept,
         CAST(sum(w.wt) AS BIGINT) AS kept_weight
  FROM w JOIN grid g ON w.src = g.src
  WHERE {sample_unit_sql(id_col, salt)} < g.keep_frac
  GROUP BY 1, 2
),
o AS (
  SELECT g.tau, g.src, g.keep_frac, g.target_share,
         COALESCE(k.n_kept, 0) AS n_kept,
         COALESCE(k.kept_weight, 0) AS kept_weight
  FROM grid g LEFT JOIN kept k ON g.tau = k.tau AND g.src = k.src
),
tk AS (SELECT tau, sum(kept_weight) AS kw FROM o GROUP BY 1),
shares AS (
  SELECT o.tau, o.src, o.keep_frac, o.target_share, o.n_kept,
         o.kept_weight,
         round(CASE WHEN tk.kw > 0
                    THEN o.kept_weight / CAST(tk.kw AS DOUBLE)
                    ELSE 0.0 END, 6) AS realized_share
  FROM o JOIN tk USING (tau)
)
SELECT tau, src AS {source_col}, keep_frac, target_share, n_kept,
       kept_weight, realized_share,
       round(abs(realized_share - target_share), 6) AS share_gap
FROM shares
"""


def doremi_mixture(df: DataFrame, id_col: str, source_col: str,
                   weight_col: str, loss_col: str,
                   rounds: int = 4, step: float = 1.0,
                   smoothing: float = 0.1,
                   budget_frac: float = 0.5,
                   salt: str = "doremi") -> DataFrame:
    """The DoReMi OUTER LOOP (Xie et al. 2023) on top of the one-pass
    mixture-evaluation primitive: iterate multiplicative-weights updates
    of the per-source mixture α, one corpus pass per round.

    Per round ``r``:

    1. realize the current α as keep fractions
       ``f_s = min(1, budget_frac · N · α_s / T_s)`` (the same
       hash-membership realization as :func:`temperature_mix`, salted
       per round so resamples are independent);
    2. ONE corpus pass: per-source ``(n_kept, kept_weight, mean loss)``
       over the kept sample — the only data-sized work in the round;
    3. driver-side on the |sources|-row table (bounded by contract,
       like the k-means centroid collect): relative excess loss
       ``e_s = (mean_s − overall_mean)/overall_mean``, multiplicative
       update ``α_s ∝ α_s · exp(step · e_s)``, then uniform smoothing
       ``α ← (1−smoothing)·α + smoothing/k`` — DoReMi's Algorithm 1
       update with the per-domain proxy-vs-reference excess replaced by
       the engine-computable per-row ``loss_col`` (unigram surprisal,
       length, a committed classifier margin — the wiring point for a
       real proxy model's scores).

    Deterministic end to end: hash membership (no RNG), integer-valued
    ``weight_col``/``loss_col`` keep every sum order-independent, and
    fractions/excess/α round to 9 decimals each round so the DuckDB
    unroll (:func:`doremi_mixture_sql`) reproduces the whole trajectory
    value-for-value. Sources with an empty sample in a round keep their
    α (excess 0) — smoothing still pulls them back toward uniform, so
    no source starves permanently.

    Returns the audit trail, one row per (round, source):
    ``(round, source, alpha, keep_frac, n_kept, kept_weight, mean_loss,
    excess, alpha_next)`` — ``alpha`` entering the round, ``alpha_next``
    leaving it; the last round's ``alpha_next`` is the learned mixture."""
    import math

    from qvarn_mr_spark.session import pin

    spark = df.sparkSession
    base = pin(df.select(
        F.col(id_col).alias("_id"),
        F.col(source_col).cast("string").alias("source"),
        F.col(weight_col).cast("double").alias("_wt"),
        F.col(loss_col).cast("double").alias("_loss")))
    tot = {r["source"]: r["_T"]
           for r in base.groupBy("source")
                        .agg(F.sum("_wt").alias("_T")).collect()}
    sources = sorted(tot)
    k = len(sources)
    if k == 0:
        raise ValueError("doremi_mixture: empty corpus")
    for s in sources:
        # keep-fraction realization divides by T_s; a zero/negative
        # total weight (all-zero weight_col, nulls cast away) would be
        # a silent ZeroDivisionError otherwise
        if tot[s] is None or tot[s] <= 0:
            raise ValueError(
                f"doremi_mixture: source {s!r} has non-positive total "
                f"weight {tot[s]!r}; every source needs positive "
                f"{weight_col!r} mass")
    n_total = sum(tot.values())
    alpha = {s: round(1.0 / k, 9) for s in sources}
    audit = []
    for r in range(1, rounds + 1):
        fr = {s: round(min(1.0, budget_frac * n_total * alpha[s]
                           / tot[s]), 9) for s in sources}
        fr_df = spark.createDataFrame(
            [(s, fr[s]) for s in sources], "source string, _f double")
        stats = {row["source"]: row for row in
                 (base.join(F.broadcast(fr_df), "source")
                  .filter(hash_unit("_id", f"{salt}-r{r}") < F.col("_f"))
                  .groupBy("source")
                  .agg(F.count(F.lit(1)).alias("n_kept"),
                       F.sum("_wt").cast("long").alias("kept_weight"),
                       F.sum("_loss").alias("_sl"))).collect()}
        n_all = sum(row["n_kept"] for row in stats.values())
        sl_all = sum(row["_sl"] for row in stats.values())
        overall = sl_all / n_all if n_all else 0.0
        excess, raw = {}, {}
        for s in sources:
            row = stats.get(s)
            if row is not None and row["n_kept"] > 0 and overall != 0.0:
                mean_s = row["_sl"] / row["n_kept"]
                excess[s] = round((mean_s - overall) / overall, 9)
            else:
                excess[s] = 0.0
            raw[s] = alpha[s] * math.exp(step * excess[s])
        z = sum(raw.values())
        nxt = {s: round((1.0 - smoothing) * raw[s] / z
                        + smoothing / k, 9) for s in sources}
        for s in sources:
            row = stats.get(s)
            mean_s = (round(row["_sl"] / row["n_kept"], 6)
                      if row is not None and row["n_kept"] else 0.0)
            audit.append((r, s, alpha[s], fr[s],
                          int(row["n_kept"]) if row else 0,
                          int(row["kept_weight"]) if row else 0,
                          mean_s, excess[s], nxt[s]))
        alpha = nxt
    return spark.createDataFrame(
        audit, "round int, source string, alpha double, keep_frac double,"
               " n_kept long, kept_weight long, mean_loss double,"
               " excess double, alpha_next double")


def doremi_mixture_sql(id_col: str, source_col: str, weight_expr: str,
                       loss_expr: str, rounds: int = 4,
                       step: float = 1.0, smoothing: float = 0.1,
                       budget_frac: float = 0.5, salt: str = "doremi",
                       table: str = "documents") -> str:
    """DuckDB twin of :func:`doremi_mixture` — the multiplicative-weights
    trajectory unrolled one CTE chain per round (fr{r} → k{r} → x{r} →
    a{r}), same 9-dp rounding points, same hash membership, UNION ALL of
    the per-round audit rows. ``weight_expr``/``loss_expr`` should be
    integer-valued for order-independent sums (same contract as the
    Spark side)."""
    bf, sm, st = float(budget_frac), float(smoothing), float(step)
    parts = [
        f"w AS MATERIALIZED (SELECT {id_col} AS _id, "
        f"CAST({source_col} AS VARCHAR) AS source, "
        f"CAST({weight_expr} AS DOUBLE) AS wt, "
        f"CAST({loss_expr} AS DOUBLE) AS loss FROM {table})",
        "tot AS MATERIALIZED (SELECT source, sum(wt) AS t"
        " FROM w GROUP BY 1)",
        "kk AS (SELECT CAST(count(*) AS DOUBLE) AS k FROM tot)",
        "nn AS (SELECT sum(t) AS n FROM tot)",
        "a0 AS (SELECT source, round(1.0 / (SELECT k FROM kk), 9) AS a"
        " FROM tot)",
    ]
    unit = sample_unit_sql("w._id", "{SALT}")
    for r in range(1, rounds + 1):
        u = unit.replace("{SALT}", f"{salt}-r{r}")
        p = f"a{r - 1}"
        parts.append(
            f"fr{r} AS (SELECT tot.source, round(least(1.0, {bf!r} * "
            f"(SELECT n FROM nn) * {p}.a / tot.t), 9) AS f, {p}.a AS a "
            f"FROM tot JOIN {p} ON tot.source = {p}.source)")
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT g.source, count(*) AS n_kept, "
            f"CAST(sum(w.wt) AS BIGINT) AS kept_weight, "
            f"sum(w.loss) AS sl "
            f"FROM w JOIN fr{r} g ON w.source = g.source "
            f"WHERE {u} < g.f GROUP BY 1)")
        parts.append(
            f"ov{r} AS (SELECT CASE WHEN sum(n_kept) > 0 "
            f"THEN sum(sl) / sum(n_kept) ELSE 0.0 END AS m FROM k{r})")
        parts.append(
            f"x{r} AS MATERIALIZED (SELECT g.source, g.a, g.f, "
            f"coalesce(k.n_kept, 0) AS n_kept, "
            f"coalesce(k.kept_weight, 0) AS kept_weight, "
            f"CASE WHEN coalesce(k.n_kept, 0) > 0 "
            f"THEN round(k.sl / k.n_kept, 6) ELSE 0.0 END AS mean_loss, "
            f"CASE WHEN coalesce(k.n_kept, 0) > 0 "
            f"AND (SELECT m FROM ov{r}) != 0.0 "
            f"THEN round((k.sl / k.n_kept - (SELECT m FROM ov{r})) "
            f"/ (SELECT m FROM ov{r}), 9) ELSE 0.0 END AS excess "
            f"FROM fr{r} g LEFT JOIN k{r} k ON g.source = k.source)")
        parts.append(
            f"z{r} AS (SELECT sum(a * exp({st!r} * excess)) AS z"
            f" FROM x{r})")
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT source, "
            f"round({1.0 - sm!r} * a * exp({st!r} * excess) "
            f"/ (SELECT z FROM z{r}) + {sm!r} / (SELECT k FROM kk), 9)"
            f" AS a FROM x{r})")
    unions = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, x{r}.source, x{r}.a AS alpha, x{r}.f AS"
        f" keep_frac, x{r}.n_kept, x{r}.kept_weight, x{r}.mean_loss,"
        f" x{r}.excess, a{r}.a AS alpha_next"
        f" FROM x{r} JOIN a{r} ON x{r}.source = a{r}.source"
        for r in range(1, rounds + 1))
    return "WITH " + ",\n".join(parts) + "\n" + unions


def stratified_fixed_k(df: DataFrame, id_col: str, strata_col: str,
                       k: int, salt: str = "fixk",
                       skew_safe: bool = False) -> DataFrame:
    """EXACTLY ``k`` rows per stratum (fewer only when the stratum is
    smaller), chosen by consistent hash order — the eval-set construction
    primitive: deterministic, retry-stable, and unbiased within each
    stratum (hash order is independent of any data column).

    Implementation: window per stratum ranked by ``(hash, id)``. A
    single-partition window over a billion-row stratum would serialize
    one reducer, so ``skew_safe=True`` routes through the two-phase
    form (:func:`qvarn_mr_spark.operators.skew.topk_per_key`, ascending
    on the hash): local bottom-k per (stratum, salt-of-id) shard, then
    bottom-k over the ≤ salt·k survivors — IDENTICAL output (the
    local-then-global top-k is exact under the same total order, pinned
    by test), with the heavy stratum's rows spread over the salt
    shards. The direct window stays the default: for eval-sized ``k``
    over bounded strata it is one exchange cheaper."""
    if skew_safe:
        from qvarn_mr_spark.operators.skew import topk_per_key
        hashed = df.withColumn("_h", hash_unit(id_col, salt))
        return (topk_per_key(hashed, [strata_col], "_h", k,
                             tiebreak=[id_col], ascending=True)
                .drop("_h", "rn"))
    w = Window.partitionBy(strata_col).orderBy(
        hash_unit(id_col, salt).asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") <= k).drop("_rk"))


def epoch_shuffle(df: DataFrame, id_col: str = "doc_id", epoch: int = 0,
                  n_shards: int = 8, salt: str = "epoch") -> DataFrame:
    """Deterministic epoch-varying global training order — the shuffle a
    training loop needs between epochs, without RNG: every row gets
    ``(shard, pos)`` where ``shard = floor(u·n_shards)`` and ``pos`` ranks
    the shard's rows by ``u = h(salt|epoch|id)``. Changing ``epoch``
    re-seeds the hash, giving a statistically independent order; the
    same (corpus, epoch) always produces the same order — reproducible
    runs, retry-stable tasks, resumable consumers.

    Consumers read shards in any order / in parallel (the standard
    sharded training layout); concatenating shards 0..n-1 by ``pos`` IS
    the epoch's global hash order, since shard boundaries are
    value-ranges of ``u``. Scale: one shuffle on ``shard`` + a per-shard
    rank window; the hash balances shards, so no window partition is
    more than ~corpus/n_shards. Appends ``(shard, pos)``."""
    u = hash_unit(id_col, f"{salt}|{int(epoch)}")
    out = df.withColumn("shard",
                        F.floor(u * n_shards).cast("long")) \
            .withColumn("_u", u)
    w = Window.partitionBy("shard").orderBy(F.col("_u").asc(),
                                            F.col(id_col).asc())
    return (out.withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("_u"))


def epoch_shuffle_sql(epoch: int, n_shards: int = 8, salt: str = "epoch",
                      id_col: str = "doc_id",
                      cols: str = "doc_id",
                      table: str = "documents") -> str:
    """DuckDB twin of :func:`epoch_shuffle` (same hash constants)."""
    unit = sample_unit_sql(id_col, f"{salt}|{int(epoch)}")
    return f"""
SELECT {cols}, shard,
       CAST(row_number() OVER (PARTITION BY shard
                               ORDER BY _u ASC, {id_col} ASC) AS BIGINT)
         AS pos
FROM (SELECT {cols}, CAST(floor({unit} * {n_shards}) AS BIGINT) AS shard,
             {unit} AS _u
      FROM {table})
"""


def length_batches(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", batch_tokens: int = 256,
                   bucket_width: int = 64) -> DataFrame:
    """Length-bucketed batch assignment — the padding-minimizing batching
    step of a training/inference pipeline: documents are grouped into
    ``bucket_width``-token length buckets (similar-length docs pad to
    similar targets), and within each bucket packed greedily (by id
    order) into batches of ≈ ``batch_tokens`` tokens:
    ``batch = floor(start_offset / batch_tokens)`` over the bucket's
    running token total — the same concat-then-chunk boundary rule as
    :func:`qvarn_mr_spark.functions.packing.pack_sequences`. Returns
    ``(doc_id, n_tokens, bucket, batch_id)``; zero-token docs are
    dropped (nothing to batch).

    Scale: one shuffle on ``bucket`` + a per-bucket running-sum window.
    A pathologically hot bucket serializes one reducer — at that point
    use the two-phase global cumsum of ``pack_sequences`` per bucket;
    this direct form is the simple exact shape for bounded buckets."""
    from qvarn_mr_spark.functions.text import token_count

    base = (df.select(F.col(id_col).alias("doc_id"),
                      token_count(F.col(text_col)).cast("long")
                      .alias("n_tokens"))
            .filter(F.col("n_tokens") > 0)
            .withColumn("bucket",
                        (F.col("n_tokens") / bucket_width).cast("long")))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    return base.select(
        "doc_id", "n_tokens", "bucket",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(batch_tokens)))
        .cast("long").alias("batch_id"))


def length_batches_sql(batch_tokens: int = 256, bucket_width: int = 64,
                       table: str = "documents") -> str:
    """DuckDB twin of :func:`length_batches` (token count shared with
    oracle.token_count_sql so both sides move together)."""
    from qvarn_mr_spark.oracle import token_count_sql

    ntok = token_count_sql("text")
    return f"""
WITH base AS (
  SELECT doc_id, CAST({ntok} AS BIGINT) AS n_tokens
  FROM {table}
),
b AS (
  SELECT doc_id, n_tokens,
         CAST(n_tokens // {bucket_width} AS BIGINT) AS bucket
  FROM base WHERE n_tokens > 0
)
SELECT doc_id, n_tokens, bucket,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY bucket
                                       ORDER BY doc_id) - n_tokens)
                  / {float(batch_tokens)}) AS BIGINT) AS batch_id
FROM b
"""


def budget_cap(df: DataFrame, id_col: str, key_col: str, weight_col: str,
               budget: int, order_col: str | None = None) -> DataFrame:
    """Greedy per-key weight budget: order each key's rows by
    ``order_col`` (descending, ``weight_col`` by default) with an
    ``id_col`` tiebreak and keep rows while the running weight total stays
    within ``budget`` — the per-domain/source token-budget cap used in
    web-corpus curation (no single domain may contribute more than its
    quota, highest-value documents first).

    Appends ``cum_weight`` (the running total including the row itself) so
    downstream stages can see how full each key's quota is.

    Rows whose OWN weight exceeds the budget are dropped before the
    running sum (a pushed-down scan filter): an oversized document can
    never fit any quota, and letting it head the greedy order would
    otherwise zero out its whole key — the running sum never resets, so
    one giant doc would block every smaller doc from an otherwise-fine
    source (ADVICE r4). With the pre-filter the quota fills with the
    largest documents that actually fit, the skip-and-continue behavior
    web-corpus budget caps use. The default-order greedy prefix remains
    greedy: a key can still close its quota with slack smaller than the
    next row's weight.

    Scale shape: one shuffle on ``key_col`` + a per-key running-sum
    window. Per-key cost is that key's row count; a pathological hot key
    serializes one reducer, in which case pre-trim with
    :func:`qvarn_mr_spark.operators.skew.topk_per_key` (any key holds at
    most ``budget / min_weight`` survivors, so top-k with that k is an
    exact pre-filter)."""
    order = [F.desc(order_col or weight_col), F.asc(id_col)]
    cum = F.sum(F.col(weight_col)).over(
        Window.partitionBy(key_col).orderBy(*order))
    return (df.filter(F.col(weight_col) <= budget)
            .withColumn("cum_weight", cum)
            .filter(F.col("cum_weight") <= budget))


#: Hashed n-gram feature width for DSIR. 256 keeps the oracle CTE
#: driver-stable at test scale; production corpora run 1e4-1e5 buckets
#: (the width is a pure parameter — nothing below materializes a
#: buckets-sized structure anywhere but the B-row ratio table).
DSIR_BUCKETS = 256
#: Nibbles of md5 used for the bucket hash: 6 → 24 bits, uniform far
#: beyond any practical bucket width.
_DSIR_NIBBLES = 6


def _gram_bucket(gram: Column, n_buckets: int, salt: str) -> Column:
    """Portable hash bucket of an n-gram: the first 6 hex nibbles of
    ``md5(salt|gram)`` decoded via ``ascii()`` arithmetic, mod
    ``n_buckets``. ``ascii`` (not the ``locate``-in-digit-string decode
    of :func:`hash_unit`) because this runs INSIDE a ``transform``
    lambda, where the needle of locate would have to be a lambda-bound
    Column — ``ascii`` needs only the character itself and has an exact
    DuckDB twin (``dsir_bucket_sql``)."""
    d = F.md5(F.concat(F.lit(f"{salt}|"), gram))
    # r13 (guide §1.2 per-task work): one conv(hex, 16, 10) replaces the
    # previous 6×(substring+ascii+when) nibble decode — same 24-bit
    # value (conv is case-insensitive over md5's lowercase hex, the
    # dedup._minhash_base_col precedent), and unlike locate it needs no
    # needle column, so it stays legal inside transform() lambdas too.
    val = F.conv(F.substring(d, 1, _DSIR_NIBBLES), 16, 10).cast("bigint")
    return val % F.lit(n_buckets)


def _dsir_grams(df: DataFrame, id_col: str, text_col: str,
                n_buckets: int, salt: str) -> DataFrame:
    """``(doc_id, bucket)`` with multiplicity: unigrams + word bigrams
    (the DSIR paper's feature set) hashed into ``n_buckets``. One narrow
    projection + explode — tokenization shared with dedup/text via
    ``tokens_col``/``shingles_col``."""
    from qvarn_mr_spark.functions.dedup import (ensure_min_partitions,
                                                shingles_col, tokens_col)
    grams = F.concat(tokens_col(text_col), shingles_col(text_col, 2))
    return (ensure_min_partitions(df)
            .select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("_g"))
            .select("doc_id",
                    _gram_bucket(F.col("_g"), n_buckets, salt)
                    .alias("bucket")))


def dsir_weights(df: DataFrame, target: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = DSIR_BUCKETS, smoothing: float = 1.0,
                 salt: str = "dsir") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*): per raw document, the
    log likelihood ratio of its hashed-n-gram bag under add-``smoothing``
    bag-of-ngrams models of the ``target`` corpus vs the raw corpus —
    the standard "select web data that looks like my curated target"
    operator. Returns ``(doc_id, n_grams, log_w)`` (natural log, 6-dp);
    documents with no grams (empty text) carry no evidence and are not
    scored.

    Shape (fully distributed, mirrors :func:`~qvarn_mr_spark.functions.
    text.unigram_surprisal` — no driver collect anywhere): two
    explode+hash-agg passes fit the two B-row bucket profiles, a B-row
    join + one-row broadcast builds the log-ratio table, and scoring
    equi-joins the raw gram stream to it (B-row side — AQE broadcasts)
    and sums per doc. At 100 TB: three shuffles total, two of them
    B-bounded; the only corpus-sized one is the per-doc sum, keyed on
    doc_id.

    The raw gram stream feeds BOTH the profile aggregate and the scoring
    join with no exchange between them to reuse, so it is pinned
    (releasable via ``session.cache_scope``) — one tokenize+hash pass
    instead of two. At 100 TB the cache spills or is dropped and the
    recompute is the fallback, so the pin is a local-memory win, never a
    correctness or capacity dependence."""
    from qvarn_mr_spark.session import pin
    raw_g = pin(_dsir_grams(df, id_col, text_col, n_buckets, salt))
    tgt_g = _dsir_grams(target, id_col, text_col, n_buckets, salt)
    rawb = raw_g.groupBy("bucket").agg(F.count(F.lit(1)).alias("_rc"))
    tgtb = tgt_g.groupBy("bucket").agg(F.count(F.lit(1)).alias("_tc"))
    tot = (rawb.agg(F.sum("_rc").alias("_R"))
           .crossJoin(tgtb.agg(F.sum("_tc").alias("_T"))))
    a, b = float(smoothing), float(smoothing) * n_buckets
    lr = (rawb.join(tgtb, "bucket", "left")
          .crossJoin(F.broadcast(tot))
          .select("bucket",
                  (F.log((F.coalesce(F.col("_tc"), F.lit(0)) + F.lit(a))
                         / (F.col("_T") + F.lit(b)))
                   - F.log((F.col("_rc") + F.lit(a))
                           / (F.col("_R") + F.lit(b)))).alias("_lr")))
    return (raw_g.join(lr, "bucket")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_grams"),
                 F.round(F.sum("_lr"), 6).alias("log_w")))


def dsir_resample(df: DataFrame, target: DataFrame, k: int,
                  id_col: str = "doc_id", text_col: str = "text",
                  n_buckets: int = DSIR_BUCKETS, smoothing: float = 1.0,
                  salt: str = "dsir") -> DataFrame:
    """DSIR selection: the top-``k`` raw documents by Gumbel-perturbed
    importance weight — sampling WITHOUT replacement with probability
    ∝ exp(log_w) via the Gumbel-top-k identity, made deterministic by
    drawing each document's Gumbel from its consistent hash
    (``g = -ln(-ln(u))``, ``u`` from :func:`hash_unit` nudged off 0 by
    half a hash step so the double log never sees an endpoint): stable
    under retries, reruns, and layout, like every sampler here.

    Returns ``(doc_id, log_w, key)``; ``key`` is the perturbed weight the
    top-k ordered on (rounded to 6-dp, doc-id tiebreak — both engines cut
    identically). The plan is TakeOrdered over a narrow projection of
    :func:`dsir_weights` — no global sort materializes."""
    # dsir_weights normalizes the id column to "doc_id" — hash that
    gum = -F.log(-F.log(hash_unit("doc_id", salt + ":g")
                        + F.lit(0.5 / UNIT_DENOM)))
    w = dsir_weights(df, target, id_col, text_col, n_buckets, smoothing,
                     salt)
    return (w.select("doc_id", "log_w",
                     F.round(F.col("log_w") + gum, 6).alias("key"))
            .orderBy(F.desc("key"), F.asc("doc_id"))
            .limit(int(k)))
