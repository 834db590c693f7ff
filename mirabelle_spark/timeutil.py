"""Event-time helpers.

The reference's clock is event time in (fractional) seconds /
nanoseconds; window membership is ``floor(time / duration)``
including correct flooring for negative times
(``action.clj:2380-2385``: ``(quot (- time (mod time duration))
duration)`` — clojure ``mod`` is a floored modulus).

We do all bucket math in integer MICROseconds (both Spark and DuckDB
store timestamps at µs precision), using ``pmod`` so negative times
floor correctly. ``window_start_us`` emits exact integer µs;
``window_start_s`` emits epoch seconds as DOUBLE — both engines
compute the identical ``int µs / 1e6`` double division, so the
comparison is still bit-exact (and exact integers whenever the
duration is a whole number of seconds).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

US = 1_000_000


def micros(time_col: str | Column) -> Column:
    c = F.col(time_col) if isinstance(time_col, str) else time_col
    return F.unix_micros(c)


def window_start_s(time_col: str | Column, duration_s: float) -> Column:
    """Tumbling-window start in epoch seconds (floor semantics).

    floor division via pmod: (t - pmod(t, d)) / d * d — exact for
    negative event times, matching the reference's window index math.
    """
    dur_us = int(round(duration_s * US))
    t = micros(time_col)
    start_us = t - F.pmod(t, F.lit(dur_us))
    return (start_us / F.lit(US)).cast("double")


def window_start_us(time_col: str | Column, duration_s: float) -> Column:
    dur_us = int(round(duration_s * US))
    t = micros(time_col)
    return t - F.pmod(t, F.lit(dur_us))


def sql_window_start_s(time_expr: str, duration_s: float) -> str:
    """DuckDB-side mirror of :func:`window_start_s` (epoch seconds)."""
    dur_us = int(round(duration_s * US))
    t = f"epoch_us({time_expr})"
    # duckdb % follows sign of dividend; emulate pmod for negatives
    pmod = f"((({t}) % {dur_us} + {dur_us}) % {dur_us})"
    return f"CAST((({t}) - {pmod}) / {US} AS DOUBLE)"
