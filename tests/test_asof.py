"""As-of join: golden semantics, direction/exactness variants, and a
brute-force differential on random data (the union-window formulation must
equal the O(n·m) definition)."""

import random

from pyspark.sql import functions as F

from qvarn_mr_spark.operators.asof import asof_join, asof_join_bucketed


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_backward_inclusive_golden(spark):
    left = _mk(spark, [("a", 10, 1), ("a", 20, 2), ("a", 5, 3),
                       ("b", 10, 4)], ["k", "ts", "lid"])
    right = _mk(spark, [("a", 10, 100), ("a", 15, 150),
                        ("c", 1, 999)], ["k", "ts", "price"])
    out = asof_join(left, right, on=["k"], payload={"price": "price"},
                    tiebreak=[])
    got = {r["lid"]: r["price"] for r in out.collect()}
    # lid=1 ts10 matches right ts10 (inclusive); lid=2 ts20 -> ts15;
    # lid=3 ts5 -> no earlier right; b has no right rows at all
    assert got == {1: 100, 2: 150, 3: None, 4: None}


def test_backward_exclusive(spark):
    left = _mk(spark, [("a", 10, 1)], ["k", "ts", "lid"])
    right = _mk(spark, [("a", 10, 100), ("a", 9, 90)], ["k", "ts", "price"])
    out = asof_join(left, right, on=["k"], payload={"price": "price"},
                    allow_exact_matches=False)
    assert out.collect()[0]["price"] == 90


def test_forward_inclusive(spark):
    left = _mk(spark, [("a", 10, 1), ("a", 16, 2)], ["k", "ts", "lid"])
    right = _mk(spark, [("a", 10, 100), ("a", 15, 150)], ["k", "ts", "price"])
    out = asof_join(left, right, on=["k"], payload={"price": "price"},
                    direction="forward")
    got = {r["lid"]: r["price"] for r in out.collect()}
    # lid=1 ts10 -> right ts10 (earliest >=); lid=2 ts16 -> nothing later
    assert got == {1: 100, 2: None}


def test_tiebreak_max_wins(spark):
    left = _mk(spark, [("a", 10, 1)], ["k", "ts", "lid"])
    right = _mk(spark, [("a", 10, 7, 70), ("a", 10, 9, 90),
                        ("a", 10, 8, 80)], ["k", "ts", "rid", "price"])
    out = asof_join(left, right, on=["k"], payload={"price": "price"},
                    tiebreak=["rid"])
    # ties on (k, ts): the max-rid right row wins deterministically
    assert out.collect()[0]["price"] == 90


def test_differential_vs_bruteforce(spark):
    rng = random.Random(7)
    left = [(rng.randrange(5), rng.randrange(50), i) for i in range(120)]
    right = [(rng.randrange(5), rng.randrange(50), 1000 + i)
             for i in range(80)]
    ldf = _mk(spark, left, ["k", "ts", "lid"])
    rdf = _mk(spark, right, ["k", "ts", "rid"])
    out = asof_join(ldf, rdf, on=["k"], payload={"rid": "rid"},
                    tiebreak=["rid"])
    got = {r["lid"]: r["rid"] for r in out.collect()}

    def brute(k, ts):
        cand = [(rts, rid) for (rk, rts, rid) in right
                if rk == k and rts <= ts]
        return max(cand)[1] if cand else None

    assert len(got) == len(left)
    for (k, ts, lid) in left:
        assert got[lid] == brute(k, ts), (k, ts, lid)


def test_bucketed_differential_skewed(spark):
    """asof_join_bucketed must equal asof_join on a skewed fixture (one
    key carries ~half of all rows) across every direction/exactness
    combination — including matches that cross bucket boundaries."""
    rng = random.Random(11)

    def key():
        return 0 if rng.random() < 0.5 else rng.randrange(1, 6)

    left = [(key(), rng.randrange(200), i) for i in range(300)]
    right = [(key(), rng.randrange(200), 1000 + i) for i in range(200)]
    ldf = _mk(spark, left, ["k", "ts", "lid"])
    rdf = _mk(spark, right, ["k", "ts", "rid"])
    for direction in ("backward", "forward"):
        for exact in (True, False):
            plain = asof_join(ldf, rdf, on=["k"], payload={"rid": "rid"},
                              direction=direction, allow_exact_matches=exact,
                              tiebreak=["rid"])
            buck = asof_join_bucketed(
                ldf, rdf, on=["k"], bucket_width=16, payload={"rid": "rid"},
                direction=direction, allow_exact_matches=exact,
                tiebreak=["rid"])
            a = {r["lid"]: r["rid"] for r in plain.collect()}
            b = {r["lid"]: r["rid"] for r in buck.collect()}
            assert a == b, (direction, exact)


def test_bucketed_plan_splits_hot_key(spark):
    """The big window must partition on (key, _bkt): the hot key's sort is
    split across time-bucket tasks instead of landing in one."""
    ldf = _mk(spark, [("a", i, i) for i in range(40)], ["k", "ts", "lid"])
    rdf = _mk(spark, [("a", i, 100 + i) for i in range(40)],
              ["k", "ts", "price"])
    out = asof_join_bucketed(ldf, rdf, on=["k"], bucket_width=8,
                             payload={"price": "price"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "_bkt" in plan
    for bad in ("BroadcastNestedLoop", "CartesianProduct"):
        assert bad not in plan, plan


def test_plan_is_single_shuffle_window(spark):
    """The formulation must plan as union -> one Exchange on the key ->
    window, with NO join operator (the naive range-join would show
    BroadcastNestedLoop / CartesianProduct)."""
    left = _mk(spark, [("a", 10, 1)], ["k", "ts", "lid"])
    right = _mk(spark, [("a", 10, 100)], ["k", "ts", "price"])
    out = asof_join(left, right, on=["k"], payload={"price": "price"})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    for bad in ("BroadcastNestedLoop", "CartesianProduct", "SortMergeJoin",
                "ShuffledHashJoin", "BroadcastHashJoin"):
        assert bad not in plan, plan


def test_tolerance_nulls_distant_matches(spark):
    left = _mk(spark, [("a", 100, 1), ("a", 200, 2), ("a", 205, 3)],
               ["k", "ts", "lid"])
    right = _mk(spark, [("a", 95, 950), ("a", 198, 980)],
                ["k", "ts", "price"])
    out = asof_join(left, right, on=["k"], payload={"price": "price"},
                    tolerance_us=5)
    got = {r["lid"]: r["price"] for r in out.collect()}
    # lid=1: match ts95 at distance 5 (inclusive) -> kept
    # lid=2: match ts198 at distance 2 -> kept
    # lid=3: match ts198 at distance 7 > 5 -> nulled
    assert got == {1: 950, 2: 980, 3: None}


def test_tolerance_bucketed_equals_plain(spark):
    random.seed(11)
    lrows = [("k%d" % (i % 3), random.randint(0, 1000), i)
             for i in range(150)]
    rrows = [("k%d" % (i % 3), random.randint(0, 1000), i * 10)
             for i in range(80)]
    left = _mk(spark, lrows, ["k", "ts", "lid"])
    right = _mk(spark, rrows, ["k", "ts", "price"])
    plain = asof_join(left, right, on=["k"], payload={"price": "price"},
                      tiebreak=["price"], tolerance_us=50)
    bucketed = asof_join_bucketed(left, right, on=["k"], bucket_width=100,
                                  tiebreak=["price"],
                                  payload={"price": "price"},
                                  tolerance_us=50)
    a = sorted((r["lid"], r["price"]) for r in plain.collect())
    b = sorted((r["lid"], r["price"]) for r in bucketed.collect())
    assert a == b
    # tolerance actually bites: some matches nulled vs the untolerated run
    loose = asof_join(left, right, on=["k"], payload={"price": "price"},
                      tiebreak=["price"])
    n_loose = sum(1 for r in loose.collect() if r["price"] is not None)
    n_tight = sum(1 for r in plain.collect() if r["price"] is not None)
    assert n_tight < n_loose
