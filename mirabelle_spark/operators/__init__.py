"""Operator library: one DataFrame transform per reference action.

Grouped by family (mirrors SURVEY.md §2):

- :mod:`.filters`      — where / split / over / under / tagged-all / expired
- :mod:`.transforms`   — scalar projections (with, default, tag, scale, …)
- :mod:`.windows`      — event-time & count windows, coalesce, project
- :mod:`.aggregations` — the ``aggregation*`` family and ``coll-*`` reducers
- :mod:`.stateful`     — order-dependent ops (ddt, changed, throttle, …)
                         as batch window functions; streaming twins live
                         in :mod:`mirabelle_spark.streaming`
"""

from mirabelle_spark.operators import (  # noqa: F401
    aggregations,
    filters,
    stateful,
    transforms,
    windows,
)

__all__ = ["aggregations", "filters", "stateful", "transforms", "windows"]
