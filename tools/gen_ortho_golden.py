#!/usr/bin/env python3
"""Golden-fixture generator for OrthogonaliseSpec.

Runs the REFERENCE orthogonalise kernel (aerial_conversion/orthogonalise/
orthogonalise.py) on hand-picked polygons and dumps input/expected-output
coordinates to src/main/resources/ortho_golden.json (the resource
GeomQueries.orthoGolden loads).

The sandbox has no shapely/geopandas, so:
  - the pure-math reference functions (calculate_initial_compass_bearing,
    calculate_segment_angles) are exec'd straight from the reference file;
  - rotate_polygon (geopandas: to_crs 3857 -> rotate about centroid ->
    to_crs 4326) is replicated exactly: pyproj 4326->3857 IS the spherical
    web-mercator closed form, and shapely's origin='centroid' is the
    polygon AREA centroid (shoelace), both reproduced below;
  - shapely.Polygon is replaced by a ring stand-in exposing exterior.xy
    (fixtures use valid rings only, so the buffer(0)/make_valid repair
    cascade is never taken).
"""
import ast
import json
import math
import statistics
import sys

REF = "/root/reference/aerial_conversion/orthogonalise/orthogonalise.py"
OUT = "src/main/resources/ortho_golden.json"

# -- exec only the pure-math defs from the reference file --
tree = ast.parse(open(REF).read())
wanted = {"calculate_initial_compass_bearing", "calculate_segment_angles"}
ns = {"math": math, "statistics": statistics}
for node in tree.body:
    if isinstance(node, ast.FunctionDef) and node.name in wanted:
        code = ast.Module(body=[node], type_ignores=[])
        exec(compile(code, REF, "exec"), ns)
calc_bearing = ns["calculate_initial_compass_bearing"]
calc_angles = ns["calculate_segment_angles"]

R = 6378137.0


def merc(lon, lat):
    return R * math.radians(lon), R * math.log(math.tan(math.pi / 4 + math.radians(lat) / 2))


def inv_merc(x, y):
    return math.degrees(x / R), math.degrees(2 * math.atan(math.exp(y / R)) - math.pi / 2)


def area_centroid(pts):
    """Shoelace area centroid of a closed ring (first == last), computed
    about a local origin like GEOS/JTS — at web-mercator magnitudes (~2e7)
    the naive form loses ~6 digits to cancellation (meters of error)."""
    ox, oy = pts[0]
    a = cx = cy = 0.0
    for (x1, y1), (x2, y2) in zip(pts[:-1], pts[1:]):
        u1, v1, u2, v2 = x1 - ox, y1 - oy, x2 - ox, y2 - oy
        cross = u1 * v2 - u2 * v1
        a += cross
        cx += (u1 + u2) * cross
        cy += (v1 + v2) * cross
    a /= 2.0
    return ox + cx / (6 * a), oy + cy / (6 * a)


class Ring:
    """shapely-Polygon stand-in for a single VALID exterior ring."""

    def __init__(self, coords):
        coords = list(coords)
        if coords[0] != coords[-1]:
            coords = coords + [coords[0]]
        self.coords = coords
        self.exterior = self
        self.xy = ([c[0] for c in coords], [c[1] for c in coords])
        self.is_valid = True
        self.interiors = []


def rotate_polygon(ring, angle):
    """orthogonalise.py:152-178 without geopandas."""
    m = [merc(lon, lat) for lon, lat in ring.coords]
    ctr = area_centroid(m)
    rad = math.radians(angle)
    ca, sa = math.cos(rad), math.sin(rad)
    out = []
    for x, y in m:
        dx, dy = x - ctr[0], y - ctr[1]
        out.append(inv_merc(ctr[0] + dx * ca - dy * sa, ctr[1] + dx * sa + dy * ca))
    return Ring(out)


def orthogonalise_ring(poly, maxAngleChange=15, skewTolerance=15):
    """orthogonalise.py:214-345 main loop, verbatim control flow."""
    polySimple = poly
    orgAngle, corAngle, dirAngle = calc_angles(polySimple)
    if statistics.stdev(corAngle) < 30:
        medAngle = statistics.median(corAngle)
    else:
        medAngle = 45
    polySimpleR = rotate_polygon(polySimple, medAngle)
    orgAngle, corAngle, dirAngle = calc_angles(polySimpleR, maxAngleChange)
    rotatedX = list(polySimpleR.exterior.xy[0])
    rotatedY = list(polySimpleR.exterior.xy[1])

    shift = 0
    for i in range(1, len(dirAngle)):
        if dirAngle[0] == dirAngle[-i]:
            shift = i
        else:
            break
    if shift != 0:
        dirAngle = dirAngle[-shift:] + dirAngle[:-shift]
        orgAngle = orgAngle[-shift:] + orgAngle[:-shift]
        rotatedX = rotatedX[-shift - 1:-1] + rotatedX[:-shift]
        rotatedY = rotatedY[-shift - 1:-1] + rotatedY[:-shift]

    dirAngleRoll = dirAngle[1:] + dirAngle[0:1]
    dirAngle = [dirAngle[i - 1] if abs(dirAngle[i] - dirAngleRoll[i]) == 2 else dirAngle[i]
                for i in range(len(dirAngle))]

    dirAngle.append(dirAngle[0])
    orgAngle.append(orgAngle[0])
    segmentBuffer = []
    for i in range(0, len(dirAngle) - 1):
        if orgAngle[i] % 90 > (45 - skewTolerance) and orgAngle[i] % 90 < (45 + skewTolerance):
            continue
        segmentBuffer.append(i)
        if dirAngle[i] == dirAngle[i + 1]:
            if orgAngle[i + 1] % 90 > (45 - skewTolerance) and orgAngle[i + 1] % 90 < (45 + skewTolerance):
                pass
            else:
                continue
        if dirAngle[i] in {0, 2}:
            tempX = statistics.mean(rotatedX[segmentBuffer[0]:segmentBuffer[-1] + 2])
            rotatedX[segmentBuffer[0]:segmentBuffer[-1] + 2] = [tempX] * (len(segmentBuffer) + 1)
        elif dirAngle[i] in {1, 3}:
            tempY = statistics.mean(rotatedY[segmentBuffer[0]:segmentBuffer[-1] + 2])
            rotatedY[segmentBuffer[0]:segmentBuffer[-1] + 2] = [tempY] * (len(segmentBuffer) + 1)
        if 0 in segmentBuffer:
            rotatedX[-1] = rotatedX[0]
            rotatedY[-1] = rotatedY[0]
        segmentBuffer = []

    if shift != 0:
        rotatedX = rotatedX[shift:] + rotatedX[1:shift + 1]
        rotatedY = rotatedY[shift:] + rotatedY[1:shift + 1]
    else:
        rotatedX[0] = rotatedX[-1]
        rotatedY[0] = rotatedY[-1]

    polyNew = Ring(list(zip(rotatedX, rotatedY)))
    return rotate_polygon(polyNew, -medAngle)


def rot_deg(pts, deg, cx, cy):
    rad = math.radians(deg)
    ca, sa = math.cos(rad), math.sin(rad)
    return [(cx + (x - cx) * ca - (y - cy) * sa, cy + (x - cx) * sa + (y - cy) * ca)
            for x, y in pts]


# -- fixtures (lon/lat near Sydney, building-sized) --
base = (151.20, -33.87)


def mk(pts_m, deg):
    """meters-offsets -> rotate by deg -> degrees around base (approx local)."""
    cx, cy = 0.0, 0.0
    pts = rot_deg(pts_m, deg, cx, cy)
    # ~meters to degrees at this latitude
    kx = 1.0 / (111320.0 * math.cos(math.radians(base[1])))
    ky = 1.0 / 110540.0
    return [(base[0] + x * kx, base[1] + y * ky) for x, y in pts]


fixtures = {
    # rectangle 10 deg off cardinal
    "rect10": mk([(0, 0), (30, 0), (30, 18), (0, 18)], 10.0),
    # L-shape 7 deg off cardinal (adjacent same-direction runs)
    "lshape7": mk([(0, 0), (40, 0), (40, 15), (22, 15), (22, 32), (0, 32)], 7.0),
    # near-45 deg building (stdev branch picks medAngle=45 only if mixed dirs;
    # this one exercises the 45-deg corAngle regime)
    "diamond44": mk([(0, 0), (25, 0), (25, 14), (0, 14)], 44.0),
    # noisy rectangle: vertices jittered so each wall needs averaging
    "noisy": mk([(0, 0), (14.8, 0.35), (30, -0.2), (30.3, 17.8), (15.1, 18.3),
                 (-0.2, 18.1)], 12.0),
}

out = {}
for name, coords in fixtures.items():
    ring = Ring(coords)
    res = orthogonalise_ring(ring, 15, 15)
    out[name] = {
        "input": [[x, y] for x, y in ring.coords],
        "expected": [[x, y] for x, y in res.coords],
    }

json.dump(out, open(OUT, "w"), indent=1)
print(f"wrote {OUT}: {', '.join(out)}")
