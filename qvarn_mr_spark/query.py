"""The Qvarn search surface, compiled to Catalyst expressions.

The reference client composes Django-ORM-style queries ``field__method=value``
(``/root/reference/qvarnmr/clients/qvarn.py:211-273``) which the Qvarn backend
parses into one generated SQL query (``[qvarn] list_resource.py:180-261``,
``[qvarn] read_only.py:114-165``). Semantics replicated here:

- P1/P2  ``exact``/``ne``  — equality, case-insensitive for strings: both
         sides lowered (``read_only.py:212-213,262-268``)
- P3     ``gt/ge/lt/le``   — ordered comparison; string values lowered
- P4/P5  ``startswith``/``contains`` — LIKE with lowered operands
         (``read_only.py:196-197``)
- P6     multiple conditions AND-ed (``read_only.py:156-158``)
- P7     a condition on field ``f`` matches top-level ``f`` OR any element of
         any array column carrying ``f`` (``read_only.py:187-224``) — Qvarn
         ORs across its flattened list tables then dedups by id; with native
         arrays the row is never duplicated, so ``exists()`` suffices
- P8     tuple value ⇒ ALL listed values must appear among the repeated
         field's elements (``clients/qvarn.py:222-237``)
- P9-11  projections: ids / show fields / show_all (``read_only.py:270-309``)
- O1     sort: multi-field; array fields sort by first element
         (``read_only.py:226-260``)
- O2     limit/offset valid only with sort, else an error
         (``[qvarn] list_resource.py:236-256``)
- P12    unknown field ⇒ error (``read_only.py:221-223``) — Catalyst raises
         on unresolved columns; we pre-check to give the same shape of error

Everything stays declarative: filters and projections reach the parquet scan
as pushed filters / pruned columns, so a search over a 100 TB table reads
only the row groups and columns it needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

METHODS = ("exact", "ne", "gt", "ge", "lt", "le", "startswith", "contains")


class FieldNotInResource(ValueError):
    """Condition on a field not present anywhere in the schema.

    Mirrors the reference's 400 ``FieldNotInResource``
    (``[qvarn] read_only.py:312-314``).
    """


class LimitWithoutSortError(ValueError):
    """limit/offset without sort — mirrors ``[qvarn] list_resource.py:255-256``."""


def _parse_condition(key: str) -> tuple[str, str]:
    """``'field__method'`` → ``(field, method)``; bare ``'field'`` → exact.

    Reference parse: ``clients/qvarn.py:246-254``.
    """
    if "__" in key:
        field, _, method = key.rpartition("__")
        if method in METHODS:
            return field, method
    return key, "exact"


def _is_string(dt: T.DataType) -> bool:
    return isinstance(dt, T.StringType)


def _coerce_value(value, dt: T.DataType):
    """Qvarn's URL-value cast: ``'true'/'false'`` → bool, strings lowered at
    compare time (``[qvarn] read_only.py:262-268``). Numeric columns take the
    value as-is."""
    if isinstance(dt, T.BooleanType) and isinstance(value, str):
        return value.lower() == "true"
    return value


def _scalar_pred(col: Column, dt: T.DataType, method: str, value) -> Column:
    value = _coerce_value(value, dt)
    if _is_string(dt) and isinstance(value, str):
        col = F.lower(col)
        value = value.lower()
    lit = F.lit(value)
    if method == "exact":
        return col == lit
    if method == "ne":
        return col != lit
    if method == "gt":
        return col > lit
    if method == "ge":
        return col >= lit
    if method == "lt":
        return col < lit
    if method == "le":
        return col <= lit
    if method == "startswith":
        return col.startswith(lit)
    if method == "contains":
        return col.contains(lit)
    raise ValueError(f"unknown search method: {method}")


def _field_sites(df: DataFrame, field: str) -> list[tuple[str, str | None, T.DataType]]:
    """All places ``field`` lives: top-level column, element of an
    array<scalar> column named ``field``, or member of any array<struct>
    column. Returns (column_name, struct_member_or_None, leaf_type).

    This is the native-array equivalent of Qvarn's OR-across-list-tables
    (``[qvarn] read_only.py:203-224``).
    """
    sites: list[tuple[str, str | None, T.DataType]] = []
    for f in df.schema.fields:
        if f.name == field and not isinstance(f.dataType, T.ArrayType):
            sites.append((f.name, None, f.dataType))
        elif isinstance(f.dataType, T.ArrayType):
            elem = f.dataType.elementType
            if f.name == field and not isinstance(elem, T.StructType):
                sites.append((f.name, None, elem))
            elif isinstance(elem, T.StructType):
                for sub in elem.fields:
                    if sub.name == field:
                        sites.append((f.name, sub.name, sub.dataType))
    return sites


def compile_condition(df: DataFrame, key: str, value) -> Column:
    """One ``field__method=value`` condition → a boolean Column."""
    field, method = _parse_condition(key)
    sites = _field_sites(df, field)
    if not sites:
        raise FieldNotInResource(f"field {field!r} not in resource schema")

    # P8: tuple/list value ⇒ every value must match (AND of per-value conds).
    if isinstance(value, (tuple, list, set)):
        return _and_all(compile_single(df, field, method, v, sites) for v in value)
    return compile_single(df, field, method, value, sites)


def _element_pred(member, dt, method, value):
    """Single-arg closure for higher-order ``exists`` (Spark inspects arity)."""
    def inner(e: Column) -> Column:
        return _scalar_pred(e if member is None else e[member], dt, method, value)
    return inner


def compile_single(df, field, method, value, sites) -> Column:
    preds = []
    for col_name, member, dt in sites:
        f = df[col_name]
        if isinstance(df.schema[col_name].dataType, T.ArrayType):
            preds.append(F.exists(f, _element_pred(member, dt, method, value)))
        else:
            preds.append(_scalar_pred(f, dt, method, value))
    return _or_all(preds)


def _and_all(preds) -> Column:
    out = None
    for p in preds:
        out = p if out is None else (out & p)
    return out


def _or_all(preds) -> Column:
    out = None
    for p in preds:
        out = p if out is None else (out | p)
    return out


def _sort_key(df: DataFrame, field: str) -> Column:
    desc = field.startswith("-")
    name = field[1:] if desc else field
    if name not in df.columns:
        raise FieldNotInResource(f"sort field {name!r} not in resource schema")
    col = df[name]
    # O1: list fields sort by first element (Qvarn joins list tables with
    # list_pos=0 — [qvarn] read_only.py:226-260).
    if isinstance(df.schema[name].dataType, T.ArrayType):
        # F.get is NULL-on-missing (ANSI-safe for empty arrays), matching
        # Qvarn's LEFT JOIN … list_pos=0 which yields NULL for empty lists
        col = F.get(col, 0)
    return col.desc() if desc else col.asc()


def search(
    df: DataFrame,
    show: tuple[str, ...] | list[str] | None = None,
    show_all: bool = False,
    sort: tuple[str, ...] | list[str] = (),
    limit: int | None = None,
    offset: int | None = None,
    id_col: str | None = None,
    **conditions,
) -> DataFrame:
    """Search a collection — the Spark form of ``QvarnApi.search``
    (``/root/reference/qvarnmr/clients/qvarn.py:211-273``).

    ``show`` selects columns (id first if ``id_col`` given); ``show_all``
    keeps everything; default mirrors the reference's ids-only result when
    ``id_col`` is set, else all columns. Sort fields prefix ``-`` for
    descending. ``limit``/``offset`` require ``sort`` (reference rule).
    """
    out = df
    cond = _and_all(compile_condition(df, k, v) for k, v in conditions.items())
    if cond is not None:
        out = out.filter(cond)

    if (limit is not None or offset is not None) and not sort:
        raise LimitWithoutSortError("limit/offset require sort")
    if sort:
        out = out.orderBy(*[_sort_key(df, s) for s in sort])
    if offset is not None:
        out = out.offset(offset)
    if limit is not None:
        out = out.limit(limit)

    if show_all:
        return out
    if show is not None:
        cols = list(show)
        if id_col and id_col not in cols:
            cols = [id_col] + cols
        return out.select(*cols)
    if id_col:
        return out.select(id_col)
    return out
