"""P8 — metadata union: Custom map ∪ computed reserved entries.

Ancestor: ``Location.Metadata()`` (location/location.go:43-65) merges
the record's free-form ``Custom`` map with the computed ``geohash``
entry; ``geohash`` is a reserved key the computed value must win
(location/location.go:17-19).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def metadata_union(custom: Column | str, **computed: Column) -> Column:
    """map<string,string> union where the ``computed`` entries override
    any same-named keys in ``custom`` (the reserved-key rule).

    Implemented as map_filter (drop reserved keys from custom) +
    map_concat — safe under Spark's default EXCEPTION map-key-dedup
    policy because the concat inputs are disjoint by construction."""
    c = F.col(custom) if isinstance(custom, str) else custom
    keys = list(computed.keys())
    cleaned = F.map_filter(c, lambda k, _: ~k.isin(*keys)) if keys else c
    if not keys:
        return cleaned
    computed_map = F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[v.cast("string") for v in computed.values()]),
    )
    return F.map_concat(F.coalesce(cleaned, F.create_map()), computed_map)


def metadata_canonical(m: Column | str) -> Column:
    """Deterministic scalar form of a map column ('k=v' entries sorted
    by key, ';'-joined) — map cells are unhashable in the compare
    harness, so contract queries emit this instead."""
    c = F.col(m) if isinstance(m, str) else m
    return F.array_join(
        F.array_sort(F.transform(
            F.map_entries(c),
            lambda e: F.concat(e.getField("key"), F.lit("="),
                               e.getField("value")),
        )),
        ";",
    )
