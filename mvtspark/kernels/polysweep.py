"""Exact boolean measures for ARBITRARY simple polygons — the full
clipper ``ClipType`` surface (src/Geometry/clipper.cs:476
ctIntersection/ctUnion/ctDifference/ctXor, :1561-1631 ``Execute``)
with none of the prior scoping (polyclip.py needs a convex pair;
boolean.py's coverage grid needs rectilinear sets). Any simple
integer-vertex rings — non-convex, any edge angle — are exact here.

Algorithm — slab decomposition, the measure-only core of a Vatti /
Bentley–Ottmann sweep:

1. Event y's = every vertex y of A and B, plus the y of every proper
   A-edge × B-edge crossing (within-polygon edges never cross — the
   rings are simple). Crossing y's are computed in exact ``Fraction``
   arithmetic, so no float discipline anywhere.
2. Between two consecutive events NOTHING structural changes: no
   vertex enters, no pair of boundary edges swaps order. Each
   polygon's cross-section {y = const} is a fixed set of intervals
   whose endpoints move LINEARLY in y, and the x-order of all
   endpoints is constant — so the measure of any boolean combination
   of the two interval sets is linear in y across the slab, and
   (midline measure) x (slab height) integrates it EXACTLY.
3. At each slab midline, each polygon's interval set is the even-odd
   pairing of its edge x-crossings (edges strictly straddling the
   midline — horizontal edges lie on event lines and never straddle).
   A single endpoint sweep over both interval sets then reads all
   four measures straight off the coverage predicate — inter from
   (inA and inB), union from (inA or inB), diff from (inA and not
   inB), xor from (inA != inB) — NOT via inclusion-exclusion, so a
   cross-engine compare checks each measure independently.

Cost: O(|A|·|B|) crossings + O(events · edges) midline evaluations
per pair — geometry-bounded (rings are tiny fence/mask shapes), and
pairs distribute embarrassingly over partitions: the Spark layer is
a pure map with no shuffle.

Orientation does not matter (even-odd fill); vertex order rotation
does not matter. Shared/collinear boundary segments contribute zero
width and drop out of every measure.
"""

from __future__ import annotations

from fractions import Fraction


def _edges(xs, ys):
    # plain Python ints: the O(E^2) crossing tests and O(slabs*edges)
    # straddle tests stay in fast integer arithmetic; Fractions only
    # materialize at actual divisions (crossing y's, midline x's)
    n = len(xs)
    return [
        (
            int(xs[i]), int(ys[i]),
            int(xs[(i + 1) % n]), int(ys[(i + 1) % n]),
        )
        for i in range(n)
    ]


def _crossing_ys(ea, eb):
    """y of every PROPER crossing (strict straddle both ways) between
    an A edge and a B edge — exact Fractions. Improper touches happen
    at vertices, whose y's are events already; parallel/collinear
    pairs have no transversal crossing."""
    ys = []
    for (p1x, p1y, p2x, p2y) in ea:
        d1x, d1y = p2x - p1x, p2y - p1y
        for (q1x, q1y, q2x, q2y) in eb:
            d2x, d2y = q2x - q1x, q2y - q1y
            den = d1x * d2y - d1y * d2x
            if den == 0:
                continue
            s1 = d1x * (q1y - p1y) - d1y * (q1x - p1x)
            s2 = d1x * (q2y - p1y) - d1y * (q2x - p1x)
            s3 = d2x * (p1y - q1y) - d2y * (p1x - q1x)
            s4 = d2x * (p2y - q1y) - d2y * (p2x - q1x)
            if (s1 * s2 < 0) and (s3 * s4 < 0):
                num = (q1x - p1x) * d2y - (q1y - p1y) * d2x
                y = p1y + Fraction(num * d1y, den)
                ys.append(y if y.denominator != 1 else int(y))
    return ys


def _xings_at(edges, ym):
    """Sorted x-crossings of the ring's edges with the line y = ym —
    even-odd pairing gives the inside intervals. ym is a slab midline,
    strictly between events, so no edge endpoint lies on it."""
    xs = []
    for (x1, y1, x2, y2) in edges:
        lo, hi = (y1, y2) if y1 <= y2 else (y2, y1)
        if lo < ym < hi:
            x = x1 + (ym - y1) * Fraction(x2 - x1, y2 - y1)
            xs.append(x if x.denominator != 1 else int(x))
    xs.sort()
    return xs


def _measures_at(xa, xb):
    """(inter, union, diff, xor) 1-D measures of the two even-odd
    interval sets given their sorted boundary crossings — one merged
    endpoint sweep, each measure read off its own coverage predicate."""
    events = sorted(set(xa) | set(xb))
    inter = union = diff = xor = Fraction(0)
    ia = ib = 0
    for k in range(len(events) - 1):
        x0, x1 = events[k], events[k + 1]
        while ia < len(xa) and xa[ia] <= x0:
            ia += 1
        while ib < len(xb) and xb[ib] <= x0:
            ib += 1
        in_a = ia % 2 == 1
        in_b = ib % 2 == 1
        w = x1 - x0
        if in_a and in_b:
            inter += w
        if in_a or in_b:
            union += w
        if in_a and not in_b:
            diff += w
        if in_a != in_b:
            xor += w
    return inter, union, diff, xor


def _hull(points):
    """Convex hull (monotone chain) of integer points — used to build
    each edge's square-join dilation piece exactly."""
    pts = sorted(set(points))
    if len(pts) <= 2:
        return pts

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lo = half(pts)
    hi = half(pts[::-1])
    return lo[:-1] + hi[:-1]


def _union_area2(pieces):
    """TWICE the exact area of the union of simple rings (each given
    as a vertex tuple list) — same slab machinery as the pair sweep,
    generalized to N pieces: events at every vertex y and every
    cross-piece edge crossing; per slab midline each piece contributes
    its even-odd intervals as +1/−1 endpoint deltas, and the union is
    measured where the running coverage count is >= 1 (within one
    simple piece the even-odd intervals are disjoint, so the sum of
    per-piece indicators IS the coverage count)."""
    edges = [_edges([p[0] for p in ring], [p[1] for p in ring])
             for ring in pieces]
    ev = set()
    for es in edges:
        ev.update(e[1] for e in es)
    for i in range(len(edges)):
        for j in range(i + 1, len(edges)):
            ev.update(_crossing_ys(edges[i], edges[j]))
    events = sorted(ev)
    total2 = Fraction(0)
    for k in range(len(events) - 1):
        ylo, yhi = events[k], events[k + 1]
        ym = Fraction(ylo + yhi, 2)
        deltas = []
        for es in edges:
            xs = _xings_at(es, ym)
            for t, x in enumerate(xs):
                deltas.append((x, 1 if t % 2 == 0 else -1))
        if not deltas:
            continue
        deltas.sort()
        width = Fraction(0)
        cov = 0
        for t in range(len(deltas) - 1):
            cov += deltas[t][1]
            if cov >= 1:
                width += deltas[t + 1][0] - deltas[t][0]
        total2 += width * 2 * (yhi - ylo)
    return total2


def _square_dilation_hull(p1, p2, r):
    """The segment's Minkowski sum with [-r, r]^2: the hull of the
    endpoint square corners (absorbs the vertex squares). Dilation
    only — erosion (r < 0) is a different operation the corner
    expansion cannot express, so reject it loudly."""
    if r < 0:
        raise ValueError("square dilation requires radius >= 0 "
                         "(erosion is not expressible as a corner hull)")
    return _hull([
        (px + sx * r, py + sy * r)
        for (px, py) in (p1, p2) for sx in (-1, 1) for sy in (-1, 1)
    ])


def _ring_area2_exact(pts):
    """TWICE the absolute shoelace area of a ring, exact Fractions."""
    n = len(pts)
    return abs(sum(
        Fraction(pts[i][0]) * pts[(i + 1) % n][1]
        - Fraction(pts[(i + 1) % n][0]) * pts[i][1]
        for i in range(n)
    ))


def square_offset_measures(xs, ys, r):
    """(base_area2, offset_area2) of the square-join offset (clipper
    jtSquare + etClosedPolygon, clipper.cs:4744-5120) of an ARBITRARY
    simple ring — no rectilinearity or convexity scoping: the offset
    region is base ∪ (every edge ⊕ [-r, r]^2), each edge dilation
    being the convex hull of its endpoints' square corners (which
    absorbs the vertex squares), measured exactly by the N-piece
    union sweep. Integer coordinates and radius >= 0 in; exact
    Fractions out (integral on octilinear-even corpora)."""
    n = len(xs)
    base = [(int(xs[i]), int(ys[i])) for i in range(n)]
    pieces = [base]
    for i in range(n):
        pieces.append(_square_dilation_hull(base[i], base[(i + 1) % n], r))
    return _ring_area2_exact(base), _union_area2(pieces)


def rings_union_area2(rings):
    """TWICE the exact union area of a LIST of simple rings (clipper
    ctUnion over N inputs — the merged-geofence shape): straight
    N-piece slab sweep. Rings are (xs, ys) pairs; any orientation,
    any angles, integer coordinates."""
    return _union_area2([
        [(int(xs[i]), int(ys[i])) for i in range(len(xs))]
        for (xs, ys) in rings
    ])


def open_buffer_square_measures(xs, ys, r):
    """(len_l1, buffer_area2) of the square-join buffer of an OPEN
    polyline (clipper etOpenSquare, clipper.cs:4744-5120): the buffer
    region is ⋃ per-segment dilation hulls (endpoint square caps are
    absorbed by the segment hulls), measured exactly by the N-piece
    union sweep; len_l1 is the exact L1 length of the path (both
    engines recompute it independently). No closing edge — open
    paths, the road-buffer shape."""
    n = len(xs)
    pts = [(int(xs[i]), int(ys[i])) for i in range(n)]
    pieces = [
        _square_dilation_hull(pts[i], pts[i + 1], r) for i in range(n - 1)
    ]
    len_l1 = sum(
        abs(pts[i + 1][0] - pts[i][0]) + abs(pts[i + 1][1] - pts[i][1])
        for i in range(n - 1)
    )
    return len_l1, _union_area2(pieces)


_TRAP_PREDS = {
    "union": lambda a, b: a == 1 or b == 1,
    "inter": lambda a, b: a == 1 and b == 1,
    "diff": lambda a, b: a == 1 and b == 0,
    "xor": lambda a, b: a != b,
}


def pair_trapezoids(ax, ay, bx, by, op="union"):
    """RESULT GEOMETRY for any of the four ClipType ops (not just
    measures): the standard trapezoidal decomposition of op(A, B).
    Each slab's maximal intervals where the op's coverage predicate
    holds become trapezoids; corners are the exact x's of the
    bounding edges at the slab's y-extremes. Returns rows
    (ylo, yhi, xl_lo, xl_hi, xr_lo, xr_hi) — left edge runs
    (xl_lo, ylo)→(xl_hi, yhi), right edge (xr_lo, ylo)→(xr_hi, yhi);
    their union is EXACTLY op(A, B) (disjoint interiors).

    Boundary-edge attribution is well-defined: two edges can only
    share a midline x if they are collinear across the slab (a proper
    crossing at the midline would itself be an event y, and midlines
    are strictly between events), so ties carry identical corner x's.
    """
    pred = _TRAP_PREDS[op]
    ea = _edges(ax, ay)
    eb = _edges(bx, by)
    events = sorted(
        {e[1] for e in ea} | {e[1] for e in eb} | set(_crossing_ys(ea, eb))
    )
    out = []
    for k in range(len(events) - 1):
        ylo, yhi = events[k], events[k + 1]
        ym = Fraction(ylo + yhi, 2)
        # per-x records: (x_at_ylo, x_at_yhi, delta_A, delta_B)
        recs = {}
        for poly, es in enumerate((ea, eb)):
            xs = []
            for (x1, y1, x2, y2) in es:
                lo, hi = (y1, y2) if y1 <= y2 else (y2, y1)
                if lo < ym < hi:
                    slope = Fraction(x2 - x1, y2 - y1)
                    xs.append((
                        x1 + (ym - y1) * slope,
                        x1 + (ylo - y1) * slope,
                        x1 + (yhi - y1) * slope,
                    ))
            xs.sort(key=lambda t: t[0])
            for t, (xm, xlo, xhi) in enumerate(xs):
                d = 1 if t % 2 == 0 else -1
                if xm in recs:
                    r = recs[xm]
                    recs[xm] = (r[0], r[1],
                                r[2] + (d if poly == 0 else 0),
                                r[3] + (d if poly == 1 else 0))
                else:
                    recs[xm] = (xlo, xhi,
                                d if poly == 0 else 0,
                                d if poly == 1 else 0)
        ca = cb = 0
        inside = False
        left = None
        for xm in sorted(recs):
            xlo, xhi, da, db = recs[xm]
            ca += da
            cb += db
            now = pred(ca, cb)
            if now and not inside:
                left = (xlo, xhi)
            elif inside and not now:
                out.append((ylo, yhi, left[0], left[1], xlo, xhi))
            inside = now
    return out


def union_trapezoids(ax, ay, bx, by):
    """Backward-compatible alias: trapezoid decomposition of A ∪ B."""
    return pair_trapezoids(ax, ay, bx, by, "union")


def region_components(ax, ay, bx, by, op="union"):
    """(n_components, area2) — REGION TOPOLOGY of op(A, B): the
    number of connected components (by INTERIOR connectivity: two
    trapezoids connect iff they share a slab boundary y and their
    x-intervals there overlap with positive length — corner touches
    do not connect; side-by-side coverage within one slab is already
    one trapezoid), plus the region area closing the measure. This is
    the piece of Vatti's output (how many result polygons) that area
    measures alone cannot see — e.g. the XOR of two overlapping rings
    shatters into many lobes."""
    tr = pair_trapezoids(ax, ay, bx, by, op)
    n = len(tr)
    parent = list(range(n))

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in range(n):
        (ylo_i, yhi_i, _, xl_hi_i, _, xr_hi_i) = tr[i]
        for j in range(n):
            if tr[j][0] != yhi_i:
                continue
            (_, _, xl_lo_j, _, xr_lo_j, _) = tr[j]
            # strict overlap at the shared y = yhi_i
            if xl_hi_i < xr_lo_j and xl_lo_j < xr_hi_i:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    comps = len({find(i) for i in range(n)})
    area2 = Fraction(0)
    for (ylo, yhi, xl0, xl1, xr0, xr1) in tr:
        area2 += (yhi - ylo) * ((xr0 - xl0) + (xr1 - xl1))
    return comps, area2


def minkowski_any_convex_measures(ax, ay, bx, by):
    """(a_area2, sum_area2) for the Minkowski sum A ⊕ B of an
    ARBITRARY simple ring A with a CONVEX ring B — past polyclip.py's
    convex⊗convex edge merge (clipper MinkowskiSum,
    clipper.cs:4596-4687, which the reference vendors for arbitrary
    paths): with B translated so one vertex sits at the origin
    (area-invariant), A ⊕ B = A ∪ ⋃_edges hull((p1 ⊕ B) ∪ (p2 ⊕ B)),
    a union of |A| convex pieces plus A itself, measured exactly by
    the N-piece slab sweep. Integer coordinates in, exact Fractions
    out."""
    n = len(ax)
    base = [(int(ax[i]), int(ay[i])) for i in range(n)]
    b0x, b0y = int(bx[0]), int(by[0])
    q = [(int(bx[j]) - b0x, int(by[j]) - b0y) for j in range(len(bx))]
    pieces = [base]
    for i in range(n):
        p1, p2 = base[i], base[(i + 1) % n]
        pieces.append(_hull([
            (qx + px, qy + py) for (qx, qy) in q for (px, py) in (p1, p2)
        ]))
    return _ring_area2_exact(base), _union_area2(pieces)


def boolean_pair_measures(ax, ay, bx, by):
    """(inter_area2, union_area2, diff_area2, xor_area2) — each TWICE
    the exact area (Fractions; integral for integer-vertex rings whose
    doubled boolean areas are integral, e.g. any octilinear corpus).
    diff is A \\ B. Inputs: vertex coordinate sequences of two simple
    rings, any orientation, any angles, integer coordinates."""
    ea = _edges(ax, ay)
    eb = _edges(bx, by)
    events = sorted(
        {e[1] for e in ea} | {e[1] for e in eb} | set(_crossing_ys(ea, eb))
    )
    inter2 = union2 = diff2 = xor2 = Fraction(0)
    for k in range(len(events) - 1):
        ylo, yhi = events[k], events[k + 1]
        ym = Fraction(ylo + yhi, 2)
        xa = _xings_at(ea, ym)
        xb = _xings_at(eb, ym)
        if not xa and not xb:
            continue
        mi, mu, md, mx = _measures_at(xa, xb)
        h2 = 2 * (yhi - ylo)
        inter2 += mi * h2
        union2 += mu * h2
        diff2 += md * h2
        xor2 += mx * h2
    return inter2, union2, diff2, xor2
