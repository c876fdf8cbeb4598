"""Search-surface conformance (SURVEY §2.2).

Each test mirrors a documented Qvarn search behavior; citations are in
qvarn_mr_spark/query.py docstrings.
"""

import pytest
from pyspark.sql import Row

from qvarn_mr_spark.query import (
    FieldNotInResource,
    LimitWithoutSortError,
    search,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        Row(id="p1", name="Alice", age=30, vip=True,
            tags=["Red", "blue"],
            contacts=[Row(kind="email", addr="A@x.com"),
                      Row(kind="phone", addr="123")]),
        Row(id="p2", name="BOB", age=25, vip=False,
            tags=["green"],
            contacts=[Row(kind="email", addr="b@Y.com")]),
        Row(id="p3", name="carol", age=35, vip=True,
            tags=[], contacts=[]),
    ]
    return spark.createDataFrame(rows)


def ids(df):
    return sorted(r["id"] for r in df.select("id").collect())


def test_exact_case_insensitive(people):
    # P1: LOWER(col) = lower(value) — read_only.py:212-213
    assert ids(search(people, name="alice")) == ["p1"]
    assert ids(search(people, name="BOB")) == ["p2"]
    assert ids(search(people, name="Bob")) == ["p2"]


def test_ne(people):
    assert ids(search(people, name__ne="ALICE")) == ["p2", "p3"]


def test_ordered_comparisons(people):
    assert ids(search(people, age__gt=25)) == ["p1", "p3"]
    assert ids(search(people, age__ge=25)) == ["p1", "p2", "p3"]
    assert ids(search(people, age__lt=30)) == ["p2"]
    assert ids(search(people, age__le=30)) == ["p1", "p2"]


def test_startswith_contains(people):
    assert ids(search(people, name__startswith="CA")) == ["p3"]
    assert ids(search(people, name__contains="li")) == ["p1"]


def test_bool_string_coercion(people):
    # 'true'/'false' URL values coerce to bool — read_only.py:262-268
    assert ids(search(people, vip="true")) == ["p1", "p3"]
    assert ids(search(people, vip="False")) == ["p2"]


def test_conjunction(people):
    # P6: conditions AND-ed
    assert ids(search(people, vip="true", age__gt=30)) == ["p3"]


def test_array_scalar_any_element(people):
    # P7: condition matches any element of a list field, case-insensitively
    assert ids(search(people, tags="RED")) == ["p1"]
    assert ids(search(people, tags="green")) == ["p2"]


def test_array_struct_member(people):
    # P7 over dict-list fields: any element's member matches
    assert ids(search(people, kind="email")) == ["p1", "p2"]
    assert ids(search(people, addr="a@X.COM")) == ["p1"]


def test_multivalue_all_must_match(people):
    # P8: tuple value ⇒ all values must appear (clients/qvarn.py:222-237)
    assert ids(search(people, tags=("red", "blue"))) == ["p1"]
    assert ids(search(people, tags=("red", "green"))) == []


def test_unknown_field_errors(people):
    # P12
    with pytest.raises(FieldNotInResource):
        search(people, nosuch="x")


def test_projections(people):
    # P9 ids-only / P10 show / P11 show_all
    assert search(people, id_col="id", name="alice").columns == ["id"]
    assert search(people, show=("name",), id_col="id").columns == ["id", "name"]
    assert len(search(people, show_all=True).columns) == 6


def test_sort_limit_offset(people):
    # O1/O2
    got = [r["id"] for r in search(people, sort=("-age",), show=("id",)).collect()]
    assert got == ["p3", "p1", "p2"]
    got = [r["id"] for r in
           search(people, sort=("age",), limit=2, show=("id",)).collect()]
    assert got == ["p2", "p1"]
    got = [r["id"] for r in
           search(people, sort=("age",), limit=2, offset=1, show=("id",)).collect()]
    assert got == ["p1", "p3"]


def test_limit_without_sort_errors(people):
    with pytest.raises(LimitWithoutSortError):
        search(people, limit=1)


def test_sort_array_field_first_element(people):
    # O1: list fields sort by first element (list_pos=0 join)
    got = [r["id"] for r in search(people, sort=("tags",), show=("id",)).collect()]
    # first elements: p1='Red', p2='green' (p3 empty → null sorts first;
    # uppercase 'R' < lowercase 'g' in binary collation)
    assert got == ["p3", "p1", "p2"]


def test_table_profile_exact_stats(spark):
    from qvarn_mr_spark.catalog import table_profile
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "a", None), (3, None, 7.5), (3, "b", 0.5)],
        "id long, s string, x double")
    got = {r["column"]: r for r in table_profile(df).collect()}
    assert set(got) == {"id", "s", "x"}
    assert all(r["n_rows"] == 4 for r in got.values())
    assert (got["id"]["n_null"], got["id"]["n_distinct"]) == (0, 3)
    assert (got["s"]["n_null"], got["s"]["n_distinct"]) == (1, 2)
    assert (got["x"]["n_null"], got["x"]["n_distinct"]) == (1, 3)
    assert (got["x"]["min_val"], got["x"]["max_val"]) == (0.5, 7.5)
    assert got["s"]["min_val"] is None        # non-numeric: no min/max
    assert (got["id"]["min_val"], got["id"]["max_val"]) == (1.0, 3.0)
