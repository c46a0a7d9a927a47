"""Geospatial column functions (SURVEY §2.8 F3/F4/F17/F18, §2.2 P1/Q2).

All pure `pyspark.sql.functions` expressions — JVM-side, codegen-friendly,
no UDFs. Earth radius matches geopy's EARTH_RADIUS (6371.0087714150598 km),
which the reference uses to convert km → radians for DBSCAN
(reference cluster_utils.py:4,25).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0087714150598  # geopy.distance.EARTH_RADIUS


@dataclass(frozen=True)
class BoundingBox:
    """west_lon, south_lat, east_lon, north_lat — the reference's 4-float
    bbox layout (reference data_utils.py:49-54)."""

    west: float
    south: float
    east: float
    north: float

    @classmethod
    def from_list(cls, bbox: list[float]) -> "BoundingBox":
        return cls(west=bbox[0], south=bbox[1], east=bbox[2], north=bbox[3])


def inbounds_closed(lon: str, lat: str, bbox: BoundingBox) -> str:
    """P1: closed-interval bbox containment (reference data_utils.py:43-46).
    Takes column names / returns a SQL expression string (r21 convention,
    see sqlexpr.py); ``flit`` keeps the bounds typed DOUBLE exactly like
    the former ``F.lit(float)``."""
    from thisishappening_spark.sqlexpr import flit

    return (
        f"{lon} >= {flit(bbox.west)} AND {lon} <= {flit(bbox.east)} "
        f"AND {lat} >= {flit(bbox.south)} AND {lat} <= {flit(bbox.north)}"
    )


def inbounds_half_open(lon: str, lat: str, bbox: BoundingBox) -> str:
    """Q2: half-open bbox used by the query layer — `>= west AND < east AND
    >= south AND < north` (reference data_base.py:344-353). Deliberately
    different from P1's closed interval; preserved as-is (SURVEY §7.4).
    SQL-string form like :func:`inbounds_closed`."""
    from thisishappening_spark.sqlexpr import flit

    return (
        f"{lon} >= {flit(bbox.west)} AND {lon} < {flit(bbox.east)} "
        f"AND {lat} >= {flit(bbox.south)} AND {lat} < {flit(bbox.north)}"
    )


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (proper lat/lon argument order)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def ref_haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """The reference's *swapped* haversine: it feeds sklearn's haversine
    metric `[lon, lat]` pairs where the metric expects `[lat, lon]`
    (reference cluster_utils.py:29), so longitudes play the latitude role.
    Bug-compatible on purpose — cluster parity requires the same metric
    (SURVEY §7.4 quirk list)."""
    return haversine_km(lon1, lat1, lon2, lat2)


def polygon_ring_centroid(ring: str) -> tuple[str, str]:
    """F3: arithmetic-mean centroid of a polygon ring given as
    array<array<double>> of [lon, lat] vertices — including any duplicated
    closing vertex, exactly like the reference's `np.mean` over the raw ring
    (reference tweet_utils.py:107-121).

    Takes/returns SQL expression strings (not Columns) so the ingest
    projection can compose the whole 23-field select as one parsed string —
    the Column-operator form cost ~40 Py4J round trips per call, paid on
    every bench-timed query construction (r21)."""

    def mean(idx: int) -> str:
        return (
            f"aggregate(transform({ring}, v -> v[{idx}]), CAST(0 AS DOUBLE), "
            f"(acc, x) -> acc + x) / CAST(size({ring}) AS DOUBLE)"
        )

    return mean(0), mean(1)


def polygon_ring_bbox(ring: str) -> str:
    """F4: min/max lon/lat of a place polygon ring → struct(west, south,
    east, north) (reference tweet_utils.py:124-134). SQL-string form."""
    lons = f"transform({ring}, v -> v[0])"
    lats = f"transform({ring}, v -> v[1])"
    return (
        f"named_struct('west', array_min({lons}), 'south', array_min({lats}), "
        f"'east', array_max({lons}), 'north', array_max({lats}))"
    )


def bounding_box_dims_km(bbox: BoundingBox) -> tuple[float, float]:
    """F17: (height_km, width_km) of a bbox. The reference uses geodesic
    (Karney/WGS84) distance (reference data_utils.py:57-61); spherical
    haversine differs <0.5% which only perturbs grid cell *count*, not
    query semantics — documented deviation (SURVEY §2.8 F17)."""

    def hav(lat1, lon1, lat2, lon2):
        rl1, rl2 = math.radians(lat1), math.radians(lat2)
        a = (
            math.sin(math.radians(lat2 - lat1) / 2) ** 2
            + math.cos(rl1) * math.cos(rl2) * math.sin(math.radians(lon2 - lon1) / 2) ** 2
        )
        return 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a))

    height = hav(bbox.south, bbox.west, bbox.north, bbox.west)
    width = hav(bbox.south, bbox.west, bbox.south, bbox.east)
    return height, width
