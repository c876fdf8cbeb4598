"""Physical-plan inspection and assertion helpers.

The reference has no planner to inspect (SURVEY §4: interpreted Python over
REST). On Spark, plan *shape* is the scale contract: a filter that doesn't
reach the parquet scan, a projection that doesn't prune columns, or a dim
join that doesn't broadcast are 100 TB regressions invisible at test scale.
These helpers turn ``explain()`` output into assertions so tests lock the
plan properties in (tests/test_plans.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The ``df.explain(mode)`` text, returned instead of printed."""
    jdf = df._jdf
    jvm = df.sparkSession._jvm
    return jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode))


@dataclass
class ScanInfo:
    location: str
    pushed_filters: str
    read_schema: str

    @property
    def columns(self) -> list[str]:
        return re.findall(r"(\w+):", self.read_schema)


def scans(df: DataFrame) -> list[ScanInfo]:
    """Every parquet scan in the physical plan with its pushed filters and
    pruned read schema."""
    txt = explain_str(df, "formatted")
    out = []
    for block in re.split(r"\n\(\d+\) ", txt):
        if not block.startswith("Scan parquet"):
            continue
        loc = re.search(r"Location: \S+ \[(.*?)\]", block)
        pushed = re.search(r"PushedFilters: \[(.*?)\]", block)
        schema = re.search(r"ReadSchema: (\S+)", block)
        out.append(ScanInfo(
            location=loc.group(1) if loc else "",
            pushed_filters=pushed.group(1) if pushed else "",
            read_schema=schema.group(1) if schema else ""))
    return out


def scan_for(df: DataFrame, table: str) -> ScanInfo:
    for s in scans(df):
        if table in s.location:
            return s
    raise AssertionError(f"no parquet scan of {table!r} in plan")


def assert_filter_pushed(df: DataFrame, table: str, fragment: str) -> None:
    """The scan of ``table`` must carry a pushed filter containing
    ``fragment`` — i.e. the predicate reached the data source and row groups
    can be skipped."""
    s = scan_for(df, table)
    assert fragment in s.pushed_filters, (
        f"filter {fragment!r} not pushed to {table} scan "
        f"(pushed: [{s.pushed_filters}])")


def assert_columns_pruned(df: DataFrame, table: str, max_cols: int) -> None:
    """The scan of ``table`` must read at most ``max_cols`` columns — the
    projection was pruned into the scan."""
    s = scan_for(df, table)
    assert len(s.columns) <= max_cols, (
        f"{table} scan reads {len(s.columns)} columns "
        f"({s.columns}), expected <= {max_cols}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    """At least ``min_count`` joins execute as broadcast joins (no shuffle
    of the big side)."""
    txt = explain_str(df, "simple")
    n = txt.count("BroadcastHashJoin") + txt.count("BroadcastNestedLoopJoin")
    assert n >= min_count, f"expected >= {min_count} broadcast joins, got {n}"


def assert_no_shuffle_join(df: DataFrame) -> None:
    txt = explain_str(df, "simple")
    assert "SortMergeJoin" not in txt and "ShuffledHashJoin" not in txt, (
        "plan contains a shuffle join:\n" + txt)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle boundaries (Exchange operators, broadcast excluded).

    After a query has run, AQE's explain shows BOTH the final and the
    initial plan — count only the final one, and not ReusedExchange."""
    txt = explain_str(df, "simple").split("== Initial Plan ==")[0]
    return len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange", txt))


def assert_max_shuffles(df: DataFrame, n: int) -> None:
    got = count_exchanges(df)
    assert got <= n, (f"plan has {got} shuffle exchanges, expected <= {n}:\n"
                      + explain_str(df, "simple"))


def assert_partial_aggregation(df: DataFrame) -> None:
    """The aggregate must split into partial (map-side combine) + final —
    the shuffle carries pre-aggregated state, not raw rows."""
    txt = explain_str(df, "formatted")
    assert "partial_" in txt, "no partial aggregation in plan"


def assert_no_broadcast_hint(df: DataFrame) -> None:
    """The logical plan carries no user-forced broadcast hint.

    A hint on a corpus-cardinality side (one row per document) is a
    driver/executor OOM at 100 TB even though it runs fine at test scale;
    joins should stay skinny equi-joins and let AQE choose broadcast only
    when the runtime size is actually small."""
    txt = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in txt and "UnresolvedHint" not in txt, (
        "logical plan carries a forced broadcast hint:\n" + txt)


def assert_top_k(df: DataFrame) -> None:
    """orderBy().limit(k) must execute as TakeOrderedAndProject — per
    partition top-k then merge, never a global sort."""
    txt = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in txt, (
        "top-k did not plan as TakeOrderedAndProject:\n" + txt)
