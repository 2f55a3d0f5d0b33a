"""Geo distance as native Column expressions.

The reference computes geodesic distance with geopy in a driver-side
Python loop (silver_table_creation.py:260-270) — O(stations²) on one
core, data pulled out of the cluster. The engine computes great-circle
(haversine) distance as a pure Catalyst expression: it runs inside
whole-stage codegen on executors, needs no UDF, and scales with the
cluster. Haversine vs geodesic differs <0.5% — irrelevant for
nearest-station assignment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0088  # mean Earth radius


def haversine_km(
    lat1: Column | str, lon1: Column | str, lat2: Column | str, lon2: Column | str
) -> Column:
    """Great-circle distance in km between two (lat, lon) pairs, in degrees."""
    lat1, lon1, lat2, lon2 = (
        F.col(c) if isinstance(c, str) else c for c in (lat1, lon1, lat2, lon2)
    )
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.atan2(F.sqrt(a), F.sqrt(1 - a))
