"""LatLonPoint geometry helpers — GeoEncodingUtils quantization and the
Polygon2D point-in-polygon test (lucene/core/src/java/org/apache/lucene/
geo/GeoEncodingUtils.java, Polygon2D.java).

- encode/decode: 32-bit quantization (floor(value / DECODE_STEP), the
  +90/+180 nextDown clamp); LatLonPointInPolygonQuery matches points on
  their DECODED values, so containment runs on the quantized grid.
- polygon_contains: the pnpoly crossings-parity walk of
  Polygon2D.Edge.contains (the interval tree is a pruning structure
  only — an edge with both vertex latitudes strictly below/above the
  point can never satisfy the crossing predicate, so the flat edge loop
  computes the same parity), the component bounding-box gate of
  componentContains (the ORIGINAL double vertex bounds, not the
  quantized ones), hole subtraction, and any-component OR for
  multipolygons.

All arithmetic is plain IEEE double — bit-identical across the Python
port, the compiled reference (pinned in GT round 71), and the DuckDB
oracle's closed-form XOR-parity expression.
"""

from __future__ import annotations

import math

_LAT_DECODE = 180.0 / (1 << 32)
_LON_DECODE = 360.0 / (1 << 32)


def encode_latitude(lat: float) -> int:
    if lat == 90.0:
        lat = math.nextafter(lat, -math.inf)
    return int(math.floor(lat / _LAT_DECODE))


def encode_longitude(lon: float) -> int:
    if lon == 180.0:
        lon = math.nextafter(lon, -math.inf)
    return int(math.floor(lon / _LON_DECODE))


def decode_latitude(encoded: int) -> float:
    return encoded * _LAT_DECODE


def decode_longitude(encoded: int) -> float:
    return encoded * _LON_DECODE


def _pnpoly(lat: float, lon: float, lats, lons) -> bool:
    """Edge.contains over the closed ring (lats[0] == lats[-1]):
    crossings parity with the reference's exact predicate."""
    res = False
    for i in range(1, len(lats)):
        lat1, lon1 = lats[i - 1], lons[i - 1]
        lat2, lon2 = lats[i], lons[i]
        if (lat1 > lat) != (lat2 > lat):
            if lon < (lon1 - lon2) * (lat - lat2) / (lat1 - lat2) + lon2:
                res = not res
    return res


def polygon_contains(lat: float, lon: float, polygons) -> bool:
    """Polygon2D.contains for an array of polygons (any component).
    polygons: [(shell_lats, shell_lons, [(hole_lats, hole_lons), ...])];
    rings closed (first vertex repeated last)."""
    for shell_lats, shell_lons, holes in polygons:
        if not (min(shell_lats) <= lat <= max(shell_lats)
                and min(shell_lons) <= lon <= max(shell_lons)):
            continue
        if _pnpoly(lat, lon, shell_lats, shell_lons):
            in_hole = False
            for h_lats, h_lons in holes:
                if (min(h_lats) <= lat <= max(h_lats)
                        and min(h_lons) <= lon <= max(h_lons)
                        and _pnpoly(lat, lon, h_lats, h_lons)):
                    in_hole = True
                    break
            if not in_hole:
                return True
    return False


def point_in_polygon_query(lat: float, lon: float, polygons) -> bool:
    """LatLonPointInPolygonQuery's per-point rule: containment on the
    quantized (encode -> decode) coordinates."""
    return polygon_contains(
        decode_latitude(encode_latitude(lat)),
        decode_longitude(encode_longitude(lon)),
        polygons,
    )
