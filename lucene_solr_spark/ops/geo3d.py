"""Geo3D — lucene/spatial3d's ellipsoidal point-in-shape membership
(Geo3DPoint.java, Geo3DUtil.java, geom/GeoPoint.java, Vector.java,
Plane.java, SidedPlane.java, GeoStandardCircle.java), scoped to the
distance-circle query (Geo3DPoint.newDistanceQuery ->
GeoCircleFactory.makeGeoCircle -> GeoStandardCircle on WGS84).

Pinned docid-exact vs the compiled module in GT round 82. All plain
IEEE double arithmetic replicated step-for-step: the WGS84 planet model
(ab/c scalings of the mean radius), the desired-ellipsoid-magnitude
projection, the 32-bit x/y/z quantization (floor encode, CENTER decode
(i+0.5)*DECODE), and the circle membership as ONE SidedPlane evaluation
(the plane through the two antipodal-safe cutoff points, sided by the
center) with Vector.MINIMUM_RESOLUTION slop — a membership test that is
a single dot product at query time, which is why it distributes as a
pure projection over (x, y, z) columns at 100 TB."""

from __future__ import annotations

import math

MINIMUM_RESOLUTION = 1.0e-12
WGS84_MEAN = 6371008.7714
WGS84_POLAR = 6356752.314245
WGS84_EQUATORIAL = 6378137.0
AB = WGS84_EQUATORIAL / WGS84_MEAN
C = WGS84_POLAR / WGS84_MEAN
_INV_AB2 = (1.0 / AB) * (1.0 / AB)
_INV_C2 = (1.0 / C) * (1.0 / C)
MAX_VALUE = max(AB, C)
_MUL = float(1 << 32) / (2.0 * MAX_VALUE)
DECODE = 1.0 / _MUL
RADIANS_PER_DEGREE = math.pi / 180.0
RADIANS_PER_METER = 1.0 / WGS84_MEAN


def encode_value(x: float) -> int:
    if x > MAX_VALUE or x < -MAX_VALUE:
        raise ValueError(f"value={x} out of bounds")
    if x == MAX_VALUE:
        x = math.nextafter(x, -math.inf)
    return int(math.floor(x / DECODE))


def decode_value(i: int) -> float:
    return (i + 0.5) * DECODE


def _magnitude_for(x: float, y: float, z: float) -> float:
    return 1.0 / math.sqrt(x * x * _INV_AB2 + y * y * _INV_AB2
                           + z * z * _INV_C2)


def geo_point(lat: float, lon: float) -> tuple[float, float, float]:
    """GeoPoint(PlanetModel.WGS84, lat, lon) — radians in."""
    sin_lat, cos_lat = math.sin(lat), math.cos(lat)
    sin_lon, cos_lon = math.sin(lon), math.cos(lon)
    ux = cos_lat * cos_lon
    uy = cos_lat * sin_lon
    uz = sin_lat
    m = _magnitude_for(ux, uy, uz)
    return (ux * m, uy * m, uz * m)


class _SidedPlane:
    def __init__(self, normal, d, inside):
        self.a, self.b, self.c = normal
        self.d = d
        sig = self.evaluate(*inside)
        self.sig_num = math.copysign(1.0, sig) if sig != 0.0 else 0.0
        if self.sig_num == 0.0:
            raise ValueError("check point on plane")

    def evaluate(self, x, y, z):
        return self.a * x + self.b * y + self.c * z + self.d

    def is_within(self, x, y, z):
        ev = self.evaluate(x, y, z)
        if abs(ev) < MINIMUM_RESOLUTION:
            return True
        return math.copysign(1.0, ev) == self.sig_num


def _cross_normalized(a, b):
    tx = a[1] * b[2] - a[2] * b[1]
    ty = a[2] * b[0] - a[0] * b[2]
    tz = a[0] * b[1] - a[1] * b[0]
    mag = math.sqrt(tx * tx + ty * ty + tz * tz)
    if abs(mag) < MINIMUM_RESOLUTION:
        raise ValueError("Degenerate/parallel vector constructed")
    inv = 1.0 / mag
    return (tx * inv, ty * inv, tz * inv)


class GeoStandardCircle:
    """GeoStandardCircle(PlanetModel.WGS84, lat, lon, cutoffAngle)."""

    def __init__(self, lat: float, lon: float, cutoff: float):
        if cutoff < MINIMUM_RESOLUTION:
            raise ValueError("Cutoff angle cannot be effectively zero")
        self.center = geo_point(lat, lon)
        upper_lat, upper_lon = lat + cutoff, lon
        if upper_lat > math.pi * 0.5:
            upper_lon += math.pi
            if upper_lon > math.pi:
                upper_lon -= 2.0 * math.pi
            upper_lat = math.pi - upper_lat
        lower_lat, lower_lon = lat - cutoff, lon
        if lower_lat < -math.pi * 0.5:
            lower_lon += math.pi
            if lower_lon > math.pi:
                lower_lon -= 2.0 * math.pi
            lower_lat = -math.pi - lower_lat
        upper = geo_point(upper_lat, upper_lon)
        lower = geo_point(lower_lat, lower_lon)
        if abs(cutoff - math.pi) < MINIMUM_RESOLUTION:
            self.circle_plane = None
            return
        # Plane.constructNormalizedZPlane(upper, lower, center): the
        # point with the greatest x^2+y^2 wins
        best, best_d = None, 0.0
        for p in (upper, lower, self.center):
            pd = p[0] * p[0] + p[1] * p[1]
            if pd > best_d:
                best_d = pd
                best = p
        if abs(best[0]) < MINIMUM_RESOLUTION and abs(best[1]) < MINIMUM_RESOLUTION:
            raise ValueError("degenerate z-plane")
        denom = 1.0 / math.sqrt(best[0] * best[0] + best[1] * best[1])
        normal_plane = (best[1] * denom, -best[0] * denom, 0.0)
        # SidedPlane.constructNormalizedPerpendicularSidedPlane
        pts = (upper[0] - lower[0], upper[1] - lower[1], upper[2] - lower[2])
        nn = _cross_normalized(normal_plane, pts)
        d = -(nn[0] * upper[0] + nn[1] * upper[1] + nn[2] * upper[2])
        self.circle_plane = _SidedPlane(nn, d, self.center)

    def is_within(self, x: float, y: float, z: float) -> bool:
        if self.circle_plane is None:
            return True
        return self.circle_plane.is_within(x, y, z)


def distance_query_matches(
    points_deg: list[tuple[float, float]],
    center_lat_deg: float,
    center_lon_deg: float,
    radius_meters: float,
) -> list[int]:
    """Geo3DPoint.newDistanceQuery accept set: each indexed point is the
    QUANTIZED (encode -> center decode) WGS84 (x, y, z); membership is
    the circle plane's sided evaluation."""
    shape = GeoStandardCircle(
        center_lat_deg * RADIANS_PER_DEGREE,
        center_lon_deg * RADIANS_PER_DEGREE,
        radius_meters * RADIANS_PER_METER,
    )
    out = []
    for i, (lat, lon) in enumerate(points_deg):
        x, y, z = geo_point(lat * RADIANS_PER_DEGREE,
                            lon * RADIANS_PER_DEGREE)
        qx = decode_value(encode_value(x))
        qy = decode_value(encode_value(y))
        qz = decode_value(encode_value(z))
        if shape.is_within(qx, qy, qz):
            out.append(i)
    return out


def circle_margin(
    point_deg: tuple[float, float],
    center_lat_deg: float,
    center_lon_deg: float,
    radius_meters: float,
) -> float:
    """|plane evaluation| of the quantized point — the boundary margin
    (used by the GT test to skip points within libm-ULP distance of the
    membership threshold, where Java Math and C libm may round apart)."""
    shape = GeoStandardCircle(
        center_lat_deg * RADIANS_PER_DEGREE,
        center_lon_deg * RADIANS_PER_DEGREE,
        radius_meters * RADIANS_PER_METER,
    )
    if shape.circle_plane is None:
        return math.inf
    lat, lon = point_deg
    x, y, z = geo_point(lat * RADIANS_PER_DEGREE, lon * RADIANS_PER_DEGREE)
    q = (decode_value(encode_value(x)), decode_value(encode_value(y)),
         decode_value(encode_value(z)))
    ev = shape.circle_plane.evaluate(*q)
    # flips happen at eval == 0 (sign) or |eval| == MINIMUM_RESOLUTION
    return min(abs(ev), abs(abs(ev) - MINIMUM_RESOLUTION))


def _magnitude_for_z(z: float) -> float:
    return 1.0 / math.sqrt((1.0 - z * z) * _INV_AB2 + z * z * _INV_C2)


class GeoRectangle:
    """geom/GeoRectangle.java (the GeoBBoxFactory path for a
    non-degenerate box with extent < PI): four SidedPlanes — two
    latitude z-planes (D = -sinLat * desired-magnitude-at-z) and two
    vertical longitude planes ((sinLon, -cosLon, 0), D = 0) — all sided
    by the middle point; membership = the conjunction."""

    def __init__(self, top_lat, bottom_lat, left_lon, right_lon):
        extent = right_lon - left_lon
        if extent < 0.0:
            extent += 2.0 * math.pi
        if extent > math.pi:
            raise ValueError("Width of rectangle too great")
        if top_lat < bottom_lat:
            raise ValueError("Top latitude less than bottom latitude")
        sin_top, sin_bottom = math.sin(top_lat), math.sin(bottom_lat)
        sin_left, cos_left = math.sin(left_lon), math.cos(left_lon)
        sin_right, cos_right = math.sin(right_lon), math.cos(right_lon)
        middle_lat = (top_lat + bottom_lat) * 0.5
        rl = right_lon
        while left_lon > rl:
            rl += math.pi * 2.0
        middle_lon = (left_lon + rl) * 0.5
        center = geo_point(middle_lat, middle_lon)
        self.planes = [
            # new SidedPlane(center, planetModel, sinTopLat)
            _SidedPlane((0.0, 0.0, 1.0),
                        -sin_top * _magnitude_for_z(sin_top), center),
            _SidedPlane((0.0, 0.0, 1.0),
                        -sin_bottom * _magnitude_for_z(sin_bottom), center),
            # new SidedPlane(center, cosLon, sinLon): Plane(y=sinLon,
            # x-coef... Plane(x, y) -> (y, -x, 0), D=0
            _SidedPlane((sin_left, -cos_left, 0.0), 0.0, center),
            _SidedPlane((sin_right, -cos_right, 0.0), 0.0, center),
        ]

    def is_within(self, x, y, z):
        return all(p.is_within(x, y, z) for p in self.planes)


def box_query_matches(
    points_deg: list[tuple[float, float]],
    min_lat_deg: float,
    max_lat_deg: float,
    min_lon_deg: float,
    max_lon_deg: float,
) -> list[int]:
    """Geo3DPoint.newBoxQuery accept set (non-degenerate, extent < PI
    boxes -> GeoRectangle)."""
    shape = GeoRectangle(
        max_lat_deg * RADIANS_PER_DEGREE,
        min_lat_deg * RADIANS_PER_DEGREE,
        min_lon_deg * RADIANS_PER_DEGREE,
        max_lon_deg * RADIANS_PER_DEGREE,
    )
    out = []
    for i, (lat, lon) in enumerate(points_deg):
        x, y, z = geo_point(lat * RADIANS_PER_DEGREE,
                            lon * RADIANS_PER_DEGREE)
        q = (decode_value(encode_value(x)), decode_value(encode_value(y)),
             decode_value(encode_value(z)))
        if shape.is_within(*q):
            out.append(i)
    return out


def box_margin(point_deg, min_lat_deg, max_lat_deg, min_lon_deg,
               max_lon_deg) -> float:
    shape = GeoRectangle(
        max_lat_deg * RADIANS_PER_DEGREE,
        min_lat_deg * RADIANS_PER_DEGREE,
        min_lon_deg * RADIANS_PER_DEGREE,
        max_lon_deg * RADIANS_PER_DEGREE,
    )
    lat, lon = point_deg
    x, y, z = geo_point(lat * RADIANS_PER_DEGREE, lon * RADIANS_PER_DEGREE)
    q = (decode_value(encode_value(x)), decode_value(encode_value(y)),
         decode_value(encode_value(z)))
    m = math.inf
    for p in shape.planes:
        ev = p.evaluate(*q)
        m = min(m, abs(ev), abs(abs(ev) - MINIMUM_RESOLUTION))
    return m
