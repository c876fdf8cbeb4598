"""Timezone-free timestamp arithmetic helpers.

The testdata timestamps are parquet TIMESTAMP with ``isAdjustedToUTC=0``,
which Spark reads as ``TIMESTAMP_NTZ`` — a wall-clock value with no zone.
Two functions that look interchangeable are NOT safe on it:

* ``F.unix_micros`` rejects NTZ outright
  (``DATATYPE_MISMATCH.UNEXPECTED_INPUT_TYPE``).
* ``cast('timestamp')`` / tz-typed literals re-interpret the wall clock in
  the *session* timezone; under a non-UTC session the shift differs across
  DST boundaries, so comparisons against literals silently move rows near
  window edges (this produced a wrong-answer hash mismatch in round 2's
  q12 while UTC-local runs looked fine).

So every operator that needs epoch math or a date-window literal goes
through these helpers, which stay entirely inside NTZ semantics — the
result is byte-identical regardless of ``spark.sql.session.timeZone``,
matching DuckDB's naive-``TIMESTAMP`` oracle semantics exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_EPOCH_NTZ = "1970-01-01 00:00:00"


def ts_us(c: Column | str) -> Column:
    """Microseconds since the *wall-clock* epoch, timezone-free.

    Accepts TIMESTAMP_NTZ, TIMESTAMP, or DATE columns: everything is cast
    to NTZ first (a no-op for NTZ and DATE; for TIMESTAMP the session-tz
    wall clock is used, which keeps *differences* exact). Equivalent to
    DuckDB ``epoch_us(ts)`` on naive timestamps.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit(_EPOCH_NTZ).cast("timestamp_ntz"),
        col.cast("timestamp_ntz"),
    )


def ts_lit(value: str) -> Column:
    """A timezone-free timestamp literal (e.g. ``ts_lit('1996-01-01')``).

    Comparisons between this and an NTZ column are pure wall-clock
    comparisons — same semantics as DuckDB ``TIMESTAMP '1996-01-01'``
    against a naive column, under ANY Spark session timezone.
    """
    return F.lit(value).cast("timestamp_ntz")
