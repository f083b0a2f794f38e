"""Event-time expression builders (SURVEY.md §2.8 F5-F7).

The reference uses two *inconsistent* coalesce orders for event time
(message_ts-first in step 1 vs datetime-first in step 2 — SURVEY.md §2.2
P10 note). This engine picks ONE canonical rule, ``coalesce(message_ts,
datetime)`` (reference: src/scripts/project_step_1.py:24), and documents
the deviation from step 2 (project_step_2.py:26,41).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_time(message_ts: Column, datetime_col: Column) -> Column:
    """Canonical event-time rule: prefer the message timestamp."""
    return F.coalesce(message_ts, datetime_col).cast("timestamp")


def local_time(ts: Column, timezone: str = "Australia/Sydney") -> Column:
    """UTC -> local wall-clock (reference: project_step_1.py:49).

    The reference pins Australia/Sydney; a commented-out variant derives the
    zone from the city name (project_step_1.py:52) — supported here by
    passing a Column, since from_utc_timestamp accepts a column tz.
    """
    tz = timezone if isinstance(timezone, Column) else F.lit(timezone)
    return F.from_utc_timestamp(ts, tz)


def iso_week(ts: Column) -> Column:
    """ISO-8601 week of year (reference: project_step_2.py:49)."""
    return F.weekofyear(ts)


def event_month(ts: Column) -> Column:
    """Calendar month (reference: project_step_2.py:48)."""
    return F.month(ts)


def event_date_str(ts: Column) -> Column:
    """Event date rendered YYYY-MM-DD — a portable, hashable key for
    oracle comparison (raw timestamps differ in ns/us precision between
    engines)."""
    return F.date_format(ts, "yyyy-MM-dd")
