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


# ---------------------------------------------------------------------------
# GeoPointField morton / z-order encoding (lucene/spatial geopoint —
# spatial/geopoint/document/GeoPointField.java, spatial/util/
# MortonEncoder.java, core util/BitUtil.java). Pinned bit-for-bit vs the
# compiled module in GT round 77. This is the term-encoded spatial
# family: points become 62-bit z-order codes, boxes become unions of
# z-ranges — the layout that makes spatial pushdown work at 100 TB
# (sort/partition by zcode -> parquet row-group pruning on BETWEENs).

_MAGIC = (
    0x5555555555555555, 0x3333333333333333, 0x0F0F0F0F0F0F0F0F,
    0x00FF00FF00FF00FF, 0x0000FFFF0000FFFF, 0x00000000FFFFFFFF,
)
_SHIFT = (1, 2, 4, 8, 16)
_M64 = (1 << 64) - 1
_GP_BITS = 31
_GP_LAT_SCALE = float(1 << _GP_BITS) / 180.0
_GP_LON_SCALE = float(1 << _GP_BITS) / 360.0


def morton_interleave(even: int, odd: int) -> int:
    """BitUtil.interleave: spread each 32-bit value over alternating
    bits; `odd` takes the odd (higher) positions."""
    v1 = even & 0xFFFFFFFF
    v2 = odd & 0xFFFFFFFF
    for i in (4, 3, 2, 1, 0):
        v1 = (v1 | (v1 << _SHIFT[i])) & _MAGIC[i]
        v2 = (v2 | (v2 << _SHIFT[i])) & _MAGIC[i]
    return ((v2 << 1) | v1) & _M64


def morton_deinterleave(b: int) -> int:
    """BitUtil.deinterleave: collapse the even bits back to 32 bits."""
    b &= _MAGIC[0]
    for i in range(5):
        b = (b ^ (b >> _SHIFT[i])) & _MAGIC[i + 1]
    return b


def geopoint_encode(lat: float, lon: float) -> int:
    """GeoPointField.encodeLatLon: MortonEncoder.encode (32-bit
    GeoEncodingUtils quantization, sign bit flipped so negatives sort
    first, lon even / lat odd) >>> 2 — a 62-bit non-negative code —
    with the reference's all-ones special case (result & 0xC000...)."""
    lat_enc = (encode_latitude(lat) & 0xFFFFFFFF) ^ 0x80000000
    lon_enc = (encode_longitude(lon) & 0xFFFFFFFF) ^ 0x80000000
    result = morton_interleave(lon_enc, lat_enc)
    if result == _M64:
        out = result & 0xC000000000000000
    else:
        out = result >> 2
    return out - (1 << 64) if out >= (1 << 63) else out  # signed long


def geopoint_decode_lat(hash_: int) -> float:
    """GeoPointField.decodeLatitude: 31-bit unscale of the odd bits."""
    return (morton_deinterleave((hash_ & _M64) >> 1) / _GP_LAT_SCALE) - 90.0


def geopoint_decode_lon(hash_: int) -> float:
    """GeoPointField.decodeLongitude: 31-bit unscale of the even bits."""
    return (morton_deinterleave(hash_ & _M64) / _GP_LON_SCALE) - 180.0


def geopoint_bbox_matches(
    hashes: list[int],
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> list[int]:
    """GeoPointInBBoxQuery accept set over encoded doc values: the
    DECODED (quantized) point must lie inside the raw double bounds
    inclusive (GeoRelationUtils.pointInRectPrecise), with the
    dateline-crossing split (maxLon < minLon -> two boxes OR'd) and the
    whole-world rewrite to FieldValueQuery (every doc with the field)."""
    if (min_lat == -90.0 and max_lat == 90.0
            and min_lon == -180.0 and max_lon == 180.0):
        return list(range(len(hashes)))
    if max_lon < min_lon:
        boxes = [(-180.0, max_lon), (min_lon, 180.0)]
    else:
        boxes = [(min_lon, max_lon)]
    out = []
    for i, h in enumerate(hashes):
        lat = geopoint_decode_lat(h)
        lon = geopoint_decode_lon(h)
        if min_lat <= lat <= max_lat and any(
                lo <= lon <= hi for lo, hi in boxes):
            out.append(i)
    return out


def morton_ranges(
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    detail_level: int = 11,
) -> list[tuple[int, int, bool]]:
    """Z-order cover of a bbox over the 62-bit geopoint code space:
    recursive quad split (two bits per level — the
    GeoPointNumericTermsEnum.computeRange shape generalized to an
    engine-side range cover). Returns [(lo, hi, boundary)] sorted;
    boundary=False ranges need no exact post-filter. detail_level
    bounds the recursion (cells per side = 2^detail_level)."""
    ranges: list[tuple[int, int, bool]] = []

    def cell_bounds(start: int, shift: int):
        end = start | ((1 << shift) - 1)
        la0 = geopoint_decode_lat(start)
        lo0 = geopoint_decode_lon(start)
        la1 = geopoint_decode_lat(end)
        lo1 = geopoint_decode_lon(end)
        return end, la0, la1, lo0, lo1

    def recurse(start: int, shift: int, level: int) -> None:
        end, la0, la1, lo0, lo1 = cell_bounds(start, shift)
        # cell vs box relation on decoded corner coords
        if la1 < min_lat or la0 > max_lat or lo1 < min_lon or lo0 > max_lon:
            return  # disjoint
        within = (la0 >= min_lat and la1 <= max_lat
                  and lo0 >= min_lon and lo1 <= max_lon)
        if within:
            ranges.append((start, end, False))
            return
        if level >= detail_level or shift <= 2:
            ranges.append((start, end, True))
            return
        q = shift - 2
        for sub in range(4):
            recurse(start | (sub << q), q, level + 1)

    recurse(0, 62, 0)
    ranges.sort()
    # coalesce adjacent ranges with the same boundary flag
    merged: list[tuple[int, int, bool]] = []
    for lo, hi, b in ranges:
        if merged and merged[-1][2] == b and merged[-1][1] + 1 == lo:
            merged[-1] = (merged[-1][0], hi, b)
        else:
            merged.append((lo, hi, b))
    return merged
