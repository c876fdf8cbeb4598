"""Consistent hash sampling: determinism, proportions, split layout,
stratified mixture weighting — and the no-shuffle plan shape."""
import pytest

from pyspark.sql import functions as F

from qvarn_mr_spark.functions.sampling import (assign_split,
                                               deterministic_sample,
                                               hash_unit, stratified_sample)


def _ids(spark, n=4000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_sample_deterministic_and_stable_under_growth(spark):
    df = _ids(spark)
    a = {r["doc_id"] for r in
         deterministic_sample(df, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(df, "doc_id", 0.3).collect()}
    assert a == b  # rerun ⇒ identical membership
    # corpus growth: sampling a superset keeps every previously-kept id
    big = _ids(spark, 8000)
    c = {r["doc_id"] for r in
         deterministic_sample(big, "doc_id", 0.3).collect()}
    assert a <= c
    # and a kept id is NEVER dropped by a larger fraction
    d = {r["doc_id"] for r in
         deterministic_sample(df, "doc_id", 0.5).collect()}
    assert a <= d


def test_sample_fraction_approx(spark):
    n = deterministic_sample(_ids(spark), "doc_id", 0.25).count()
    assert 0.2 < n / 4000 < 0.3


def test_salts_independent(spark):
    df = _ids(spark)
    a = {r["doc_id"] for r in
         deterministic_sample(df, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in
         deterministic_sample(df, "doc_id", 0.5, salt="b").collect()}
    overlap = len(a & b) / 4000
    assert 0.15 < overlap < 0.35  # ≈ 0.25 if independent


def test_split_partitions_everything_once(spark):
    df = _ids(spark)
    out = assign_split(df, "doc_id", {"train": 0.8, "val": 0.1,
                                      "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 4000  # exhaustive, no overlap by CASE
    assert 0.75 < counts["train"] / 4000 < 0.85
    assert 0.05 < counts["val"] / 4000 < 0.15
    assert 0.05 < counts["test"] / 4000 < 0.15


def test_stratified_fractions(spark):
    df = _ids(spark).withColumn(
        "src", F.when(F.col("doc_id") % 2 == 0, "keep_all")
                .otherwise("downweight"))
    out = stratified_sample(df, "doc_id", "src",
                            {"keep_all": 1.0, "downweight": 0.2})
    counts = {r["src"]: r["n"] for r in
              out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert counts["keep_all"] == 2000  # fraction 1.0 keeps everything
    assert 0.12 < counts["downweight"] / 2000 < 0.28


def test_sampling_is_narrow_no_shuffle(spark):
    plan = (deterministic_sample(_ids(spark), "doc_id", 0.3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan  # pure per-row filter, no shuffle


def test_temperature_fractions_math(spark):
    from qvarn_mr_spark.functions.sampling import temperature_fractions
    rows = spark.createDataFrame(
        [(f"{s}{i}", s, w / 10) for s, w in
         [("a", 800.0), ("b", 150.0), ("c", 50.0)] for i in range(10)],
        "doc_id string, source string, wt double")
    # tau=1: mixture == natural distribution -> every keep_frac == budget
    fr1 = {r["source"]: r["keep_frac"] for r in
           temperature_fractions(rows, "source", "wt", tau=1.0,
                                 budget_frac=0.4).collect()}
    for v in fr1.values():
        assert v == pytest.approx(0.4, abs=1e-9)
    # tau=0: equal token budget per source -> keep_frac inversely
    # proportional to source mass (clamped at 1)
    fr0 = {r["source"]: r["keep_frac"] for r in
           temperature_fractions(rows, "source", "wt", tau=0.0,
                                 budget_frac=0.3).collect()}
    n = 1000.0
    for s, t in [("a", 800.0), ("b", 150.0), ("c", 50.0)]:
        assert fr0[s] == pytest.approx(min(1.0, 0.3 * n / 3 / t), abs=1e-9)
    # tau in between: tail boosted relative to head
    frh = {r["source"]: r["keep_frac"] for r in
           temperature_fractions(rows, "source", "wt", tau=0.5,
                                 budget_frac=0.3).collect()}
    assert frh["c"] > frh["b"] > frh["a"]


def test_temperature_mix_deterministic_and_budgeted(spark, sf_dir):
    from qvarn_mr_spark.catalog import load_tables
    from qvarn_mr_spark.functions.sampling import temperature_mix
    from qvarn_mr_spark.functions.text import token_count
    docs = load_tables(spark, sf_dir, tables=("documents",))["documents"]
    w = docs.select("doc_id", "source",
                    token_count(F.col("text")).cast("double").alias("wt"))
    a = sorted(r["doc_id"] for r in
               temperature_mix(w, "doc_id", "source", "wt",
                               tau=0.5, budget_frac=0.5).collect())
    b = sorted(r["doc_id"] for r in
               temperature_mix(w, "doc_id", "source", "wt",
                               tau=0.5, budget_frac=0.5).collect())
    assert a == b and a
    # realized token budget lands near the request (hash noise aside)
    total = w.agg(F.sum("wt")).collect()[0][0]
    kept = (temperature_mix(w, "doc_id", "source", "wt",
                            tau=0.5, budget_frac=0.5)
            .agg(F.sum("wt")).collect()[0][0])
    assert 0.35 * total < kept < 0.65 * total


def test_stratified_fixed_k_exact_and_deterministic(spark):
    from qvarn_mr_spark.functions.sampling import stratified_fixed_k
    rows = [(i, "a" if i < 20 else "b") for i in range(30)] + [(99, "c")]
    df = spark.createDataFrame(rows, "doc_id long, s string")
    got = stratified_fixed_k(df, "doc_id", "s", k=5)
    per = {r["s"]: 0 for r in got.collect()}
    for r in got.collect():
        per[r["s"]] += 1
    assert per == {"a": 5, "b": 5, "c": 1}   # capped by stratum size
    again = stratified_fixed_k(df, "doc_id", "s", k=5)
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, again.collect()))
    # different salt -> (almost surely) different members, same counts
    other = stratified_fixed_k(df, "doc_id", "s", k=5, salt="other")
    assert other.count() == 11
    # r12: the skew-safe two-phase form selects the IDENTICAL rows (the
    # local-then-global bottom-k is exact under the same total order)
    # and its plan shards the stratum window by a salt column
    safe = stratified_fixed_k(df, "doc_id", "s", k=5, skew_safe=True)
    assert sorted(map(tuple, safe.select("doc_id", "s").collect())) == \
        sorted(map(tuple, got.select("doc_id", "s").collect()))
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(safe, "formatted")
    assert "_salt" in txt


def test_budget_cap_greedy_and_exact(spark):
    from qvarn_mr_spark.functions.sampling import budget_cap
    rows = [(1, "a", 50), (2, "a", 30), (3, "a", 30), (4, "a", 10),
            (5, "b", 200), (6, "b", 5)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w long")
    got = {r["doc_id"]: r["cum_weight"]
           for r in budget_cap(df, "doc_id", "source", "w",
                               budget=100).collect()}
    # a: 50(1)+30(2)=80 fits, +30(3)=110 overflows -> docs 1,2 kept (3
    # loses the doc_id tiebreak; 4 blocked even though it would fit —
    # greedy prefix, not knapsack). b: 200 can never fit the quota and
    # is dropped BEFORE the running sum (ADVICE r4), so the smaller doc
    # 6 still fills b's budget instead of being blocked forever.
    assert got == {1: 50, 2: 80, 6: 5}
    # budget big enough keeps everything with full running sums
    full = {r["doc_id"]: r["cum_weight"]
            for r in budget_cap(df, "doc_id", "source", "w",
                                budget=10**6).collect()}
    assert full == {1: 50, 2: 80, 3: 110, 4: 120, 5: 200, 6: 205}


def test_epoch_shuffle_deterministic_and_epoch_varying(spark):
    from qvarn_mr_spark.functions.sampling import epoch_shuffle
    df = spark.createDataFrame([(f"d{i}",) for i in range(40)],
                               "doc_id string")

    def order(epoch):
        rows = epoch_shuffle(df, "doc_id", epoch=epoch, n_shards=4).collect()
        # concatenating shards by pos is the epoch's global hash order
        return [r["doc_id"] for r in
                sorted(rows, key=lambda r: (r["shard"], r["pos"]))]

    o1, o1b, o2 = order(1), order(1), order(2)
    assert o1 == o1b                      # reproducible
    assert sorted(o1) == sorted(o2)       # same rows...
    assert o1 != o2                       # ...different order per epoch
    # pos is dense 1..k within each shard
    rows = epoch_shuffle(df, "doc_id", epoch=1, n_shards=4).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    assert set(by_shard) <= {0, 1, 2, 3}


def test_length_batches_hand_checked(spark):
    from qvarn_mr_spark.functions.sampling import length_batches
    rows = [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, ""),
            (5, " ".join(["w"] * 70))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["bucket"], r["batch_id"])
           for r in length_batches(df, batch_tokens=6,
                                   bucket_width=64).collect()}
    assert 4 not in got                          # empty doc dropped
    # bucket 0 (len < 64) in id order: 3+2+4 tokens; starts 0,3,5 ->
    # batches floor(0/6)=0, floor(3/6)=0, floor(5/6)=0
    assert got[1] == (3, 0, 0)
    assert got[2] == (2, 0, 0)
    assert got[3] == (4, 0, 0)
    assert got[5] == (70, 1, 0)                  # its own 64-token bucket
    # tighter budget splits the batches at the chunk boundary
    got2 = {r["doc_id"]: r["batch_id"]
            for r in length_batches(df, batch_tokens=4,
                                    bucket_width=64).collect()}
    assert (got2[1], got2[2], got2[3]) == (0, 0, 1)   # start 5 -> batch 1


def _dsir_model(rows, target_ids, n_buckets=64, smoothing=1.0,
                salt="dsir"):
    """Pure-python DSIR model: same tokenization (TOKEN_RE), same
    md5-nibble bucket hash, same add-k likelihood ratio."""
    import hashlib
    import math
    import re

    from qvarn_mr_spark.functions.dedup import TOKEN_RE

    def grams(text):
        t = [x for x in re.split(TOKEN_RE, (text or "").lower()) if x]
        return t + [f"{a} {b}" for a, b in zip(t, t[1:])]

    def bucket(g):
        h = hashlib.md5(f"{salt}|{g}".encode()).hexdigest()
        return int(h[:6], 16) % n_buckets

    raw = {i: [bucket(g) for g in grams(t)] for i, t in rows}
    rc, tc = {}, {}
    for i, bs in raw.items():
        for b in bs:
            rc[b] = rc.get(b, 0) + 1
            if i in target_ids:
                tc[b] = tc.get(b, 0) + 1
    R, T = sum(rc.values()), sum(tc.values())
    a, bb = smoothing, smoothing * n_buckets
    lr = {b: math.log((tc.get(b, 0) + a) / (T + bb))
          - math.log((rc[b] + a) / (R + bb)) for b in rc}
    return {i: (len(bs), round(sum(lr[b] for b in bs), 6))
            for i, bs in raw.items() if bs}


def test_dsir_weights_randomized_differential(spark):
    """Seeded random corpora: Spark dsir_weights must equal the pure
    hashlib/math model exactly (tokenizer, bucket hash, smoothing and
    ratio arithmetic all in lockstep)."""
    import random

    from qvarn_mr_spark.functions.sampling import dsir_weights

    rng = random.Random(20260814)
    vocab_tgt = ["alpha", "beta", "gamma", "delta", "spark", "query"]
    vocab_raw = vocab_tgt + ["junk", "noise", "spam", "xx1", "zz9", ""]
    rows = []
    for i in range(60):
        words = [rng.choice(vocab_raw if i % 3 else vocab_tgt)
                 for _ in range(rng.randint(0, 12))]
        rows.append((i, " ".join(words)))
    target_ids = {i for i, _ in rows if i % 5 == 0}

    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = df.filter(F.col("doc_id") % 5 == 0)
    got = {r["doc_id"]: (r["n_grams"], r["log_w"])
           for r in dsir_weights(df, tgt, n_buckets=64).collect()}
    want = _dsir_model(rows, target_ids)
    assert got == want and want
    # docs whose gram stream is empty are unscored, not zero-scored
    empties = {i for i, t in rows
               if not [x for x in t.split() if x]}
    assert empties.isdisjoint(got)


def test_dsir_resample_gumbel_topk(spark):
    """Gumbel-top-k selection: deterministic (two runs identical), the
    key equals log_w + the hash-derived Gumbel of the model, and k cuts
    by (key desc, doc_id asc)."""
    import hashlib
    import math

    from qvarn_mr_spark.functions.sampling import (UNIT_DENOM,
                                                   dsir_resample)

    rows = [(i, "alpha beta gamma" if i % 2 else "junk noise spam xx1")
            for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt = df.filter(F.col("doc_id") % 2 == 1)

    def gumbel(i):
        h = hashlib.md5(f"dsir:g|{i}".encode()).hexdigest()
        u = int(h[:8], 16) / UNIT_DENOM + 0.5 / UNIT_DENOM
        return -math.log(-math.log(u))

    w = _dsir_model(rows, {i for i, _ in rows if i % 2}, n_buckets=256)
    keys = sorted(((round(lw + gumbel(i), 6), -i) for i, (_, lw)
                   in w.items()), reverse=True)
    want_ids = {-ni for _, ni in keys[:10]}

    got = dsir_resample(df, tgt, k=10, n_buckets=256).collect()
    assert {r["doc_id"] for r in got} == want_ids
    again = dsir_resample(df, tgt, k=10, n_buckets=256).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # weight-biased: target-looking docs dominate the selection
    assert sum(1 for r in got if r["doc_id"] % 2) >= 8


def test_doremi_mixture_differential_vs_python(spark):
    """The full multiplicative-weights trajectory (keep fractions, per
    round sample stats, excess, α updates) must match a row-at-a-time
    Python reference implementing DoReMi's update with the same
    consistent hash — every audit field, every round."""
    import hashlib
    import math

    from qvarn_mr_spark.functions.sampling import doremi_mixture

    rows = [(f"d{i}", f"s{i % 4}", float(20 + (i * 13) % 80),
             float(1 + (i * 7) % 9)) for i in range(400)]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, wt double, loss double")
    rounds, step, sm, bf, salt = 3, 1.0, 0.1, 0.5, "dm-test"
    got = {(r["round"], r["source"]): r
           for r in doremi_mixture(df, "doc_id", "source", "wt", "loss",
                                   rounds=rounds, step=step, smoothing=sm,
                                   budget_frac=bf, salt=salt).collect()}

    def hunit(value, s):
        h = hashlib.md5(f"{s}|{value}".encode()).hexdigest()
        return int(h[:8], 16) / 16 ** 8

    sources = sorted({s for _, s, _, _ in rows})
    tot = {s: sum(w for _, src, w, _ in rows if src == s)
           for s in sources}
    n_total = sum(tot.values())
    k = len(sources)
    alpha = {s: round(1.0 / k, 9) for s in sources}
    for r in range(1, rounds + 1):
        fr = {s: round(min(1.0, bf * n_total * alpha[s] / tot[s]), 9)
              for s in sources}
        kept = [(i, s, w, l) for i, s, w, l in rows
                if hunit(i, f"{salt}-r{r}") < fr[s]]
        n_all = len(kept)
        overall = sum(l for *_, l in kept) / n_all
        excess, raw = {}, {}
        for s in sources:
            ks = [(w, l) for _, src, w, l in kept if src == s]
            if ks and overall != 0.0:
                mean_s = sum(l for _, l in ks) / len(ks)
                excess[s] = round((mean_s - overall) / overall, 9)
            else:
                excess[s] = 0.0
            raw[s] = alpha[s] * math.exp(step * excess[s])
        z = sum(raw.values())
        nxt = {s: round((1.0 - sm) * raw[s] / z + sm / k, 9)
               for s in sources}
        for s in sources:
            ks = [(w, l) for _, src, w, l in kept if src == s]
            row = got[(r, s)]
            assert row["alpha"] == pytest.approx(alpha[s], abs=1e-12)
            assert row["keep_frac"] == pytest.approx(fr[s], abs=1e-12)
            assert row["n_kept"] == len(ks)
            assert row["kept_weight"] == int(sum(w for w, _ in ks))
            assert row["excess"] == pytest.approx(excess[s], abs=1e-12)
            assert row["alpha_next"] == pytest.approx(nxt[s], abs=1e-12)
        alpha = nxt
    # α stays a distribution every round, and smoothing floors it
    for r in range(1, rounds + 1):
        a = [got[(r, s)]["alpha_next"] for s in sources]
        assert sum(a) == pytest.approx(1.0, abs=1e-6)
        assert min(a) >= sm / k - 1e-9


def test_doremi_mixture_moves_alpha_toward_low_loss(spark):
    """Directionality: with step < 0 (prefer LOW loss, the down-weight-
    hard-domains convention) the low-loss source's α must grow and the
    high-loss source's shrink; with step > 0 the opposite."""
    from qvarn_mr_spark.functions.sampling import doremi_mixture

    rows = ([(f"a{i}", "lo", 10.0, 1.0) for i in range(100)]
            + [(f"b{i}", "hi", 10.0, 9.0) for i in range(100)])
    df = spark.createDataFrame(
        rows, "doc_id string, source string, wt double, loss double")
    out = {(r["round"], r["source"]): r
           for r in doremi_mixture(df, "doc_id", "source", "wt", "loss",
                                   rounds=2, step=-1.0).collect()}
    assert out[(2, "lo")]["alpha_next"] > 0.5 > out[(2, "hi")]["alpha_next"]
    up = {(r["round"], r["source"]): r
          for r in doremi_mixture(df, "doc_id", "source", "wt", "loss",
                                  rounds=2, step=1.0).collect()}
    assert up[(2, "hi")]["alpha_next"] > 0.5 > up[(2, "lo")]["alpha_next"]


def test_doremi_mixture_zero_weight_source_raises(spark):
    """ADVICE r8: a source whose total weight sums to 0 used to hit an
    uncaught ZeroDivisionError in the keep-fraction realization; it
    must now raise a ValueError naming the offending source."""
    import pytest

    from qvarn_mr_spark.functions.sampling import doremi_mixture

    rows = ([(f"a{i}", "ok", 10.0, 1.0) for i in range(20)]
            + [(f"b{i}", "dead", 0.0, 2.0) for i in range(20)])
    df = spark.createDataFrame(
        rows, "doc_id string, source string, wt double, loss double")
    with pytest.raises(ValueError, match="dead"):
        doremi_mixture(df, "doc_id", "source", "wt", "loss", rounds=1)


def test_mixture_weight_search_grid(spark):
    """Grid invariants + per-tau agreement with the single-tau operator:
    each grid point's (n_kept, kept_weight) must equal what
    temperature_mix at that tau (same salt) actually keeps, realized
    shares sum to ~1 per tau, tau=1.0 targets proportional shares, and
    tau=0.0 targets uniform shares."""
    from qvarn_mr_spark.functions.sampling import (mixture_weight_search,
                                                   temperature_mix)

    rows = [(f"d{i}", f"src{i % 3}", float(10 + (i * 7) % 50))
            for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, source string, wt double")
    taus = (0.0, 0.5, 1.0)
    got = mixture_weight_search(df, "doc_id", "source", "wt",
                                taus=taus, budget_frac=0.5).collect()
    assert len(got) == 9
    by_tau = {}
    for r in got:
        by_tau.setdefault(r["tau"], {})[r["source"]] = r

    totals = {s: sum(w for _, src, w in rows if src == s)
              for s in ("src0", "src1", "src2")}
    n_total = sum(totals.values())
    for tau, per_src in by_tau.items():
        # realized shares sum to 1 (all kept mass attributed)
        assert sum(r["realized_share"] for r in per_src.values()) \
            == pytest.approx(1.0, abs=2e-6)
        # grid row == the single-tau operator's actual kept set
        kept = (temperature_mix(df, "doc_id", "source", "wt",
                                tau=tau, budget_frac=0.5)
                .groupBy("source")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum("wt").cast("long").alias("w"))).collect()
        kept = {r["source"]: r for r in kept}
        for src, r in per_src.items():
            k = kept.get(src)
            assert r["n_kept"] == (k["n"] if k else 0)
            assert r["kept_weight"] == (k["w"] if k else 0)
    # tau=1.0 -> proportional target shares; tau=0.0 -> uniform
    for src in totals:
        assert by_tau[1.0][src]["target_share"] \
            == pytest.approx(totals[src] / n_total, abs=1e-6)
        assert by_tau[0.0][src]["target_share"] \
            == pytest.approx(1 / 3, abs=1e-6)
