"""As-of join: golden semantics, direction/exactness variants, and a
brute-force differential on random data (the union-window formulation must
equal the O(n·m) definition)."""

import random

from pyspark.sql import functions as F

from qvarn_mr_spark.operators.asof import asof_join


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
