"""Q11/F23 temporal helpers — UTC→local-zone calendar logic
(reference app.py:489-506)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_local_day(ts: Column, tz: str) -> Column:
    """F23: UTC timestamp → local calendar date (reference app.py:498-506,
    astimezone + date). Zone-aware (DST-correct) via from_utc_timestamp."""
    return F.to_date(F.from_utc_timestamp(ts, tz))


def local_day_filter(
    df: DataFrame, tz: str, day, time_col: str = "created_at"
) -> DataFrame:
    """Q11: keep rows whose created_at falls on `day` in zone `tz`
    (the daily-event subset, reference app.py:498-506)."""
    return df.filter(to_local_day(F.col(time_col), tz) == F.lit(day))
