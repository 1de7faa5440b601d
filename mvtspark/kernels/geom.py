"""MVT geometry kernels, vectorized in numpy.

Re-implements (from the public MVT 2.x spec + reference semantics):

- command-integer split cmd=g&7, count=g>>3
                       (ref: src/Geometry/DecodeGeometry.cs:48-50)
- zigzag-delta cursor decode with MoveTo part splits and explicit
  ClosePath ring closure (first vertex re-appended)
                       (ref: src/Geometry/DecodeGeometry.cs:31-91)
- command-stream encode (inverse; diff + zigzag + interleave)
- Scale<T> with banker's rounding for integer targets
                       (ref: src/Geometry/DecodeGeometry.cs:101-144 —
                        Convert.ToInt64 = round-half-to-even = np.rint)
- signed polygon area (shoelace)
                       (ref: src/VectorTileReader/VectorTileFeature.cs:130-141,
                        src/Geometry/clipper.cs:4387-4400)
- point-in-polygon with {0 out, 1 in, -1 boundary} crossing-rule
  semantics          (ref: src/Geometry/clipper.cs:4025-4077,
                        Hormann–Agathos)
- axis-aligned rectangle clip: bbox filter for points
  (ref: src/Geometry/Util.cs:42-68), Sutherland–Hodgman for polygons and
  Liang–Barsky segment clip for linestrings — the reference reaches the
  same results through vendored Clipper's ctIntersection against a rect
  (src/Geometry/Util.cs:75-123); a full Vatti engine is unnecessary
  because the clip target is always an axis-aligned rectangle
  (Util.cs:80-83).

Ragged layout: a multipart geometry is (xs, ys, part_offsets) parallel
arrays — part i is xs[off[i]:off[i+1]] — mirroring the reference's
List<List<Point2d>> without per-row Python objects.
"""

from __future__ import annotations

import numpy as np

from .pbf import zigzag_decode, zigzag_encode

# ref: src/PbfReader/Constants.cs:25-30
CMD_MOVE_TO = 1
CMD_LINE_TO = 2
CMD_CLOSE_PATH = 7

# ref: src/Geometry/Geometry.cs:25-34
GEOM_UNKNOWN = 0
GEOM_POINT = 1
GEOM_LINESTRING = 2
GEOM_POLYGON = 3


class GeometryError(ValueError):
    pass


def decode_commands(
    commands: np.ndarray, geom_type: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a packed command-integer stream → (xs, ys, part_offsets).

    Semantics replicated exactly from src/Geometry/DecodeGeometry.cs:31-91:
    - MoveTo starts a new part (for count>1 point-multipoints, each MoveTo
      pair is its own part only when a part is already open — the reference
      flushes the open part on every MoveTo command *integer*, then appends
      `count` cursor positions to one part; DecodeGeometry.cs:52-66);
    - the cursor (running sum of zigzag deltas) persists across parts;
    - ClosePath appends the part's first vertex (rings come back explicitly
      closed, first == last; DecodeGeometry.cs:76-82).

    The per-header loop is over command *headers* (a handful per feature);
    all parameter decoding (zigzag + cumsum) is vectorized.
    """
    g = np.asarray(commands, dtype=np.uint32)
    n = g.size
    # First pass over headers: locate parameter spans and part boundaries.
    headers: list[tuple[int, int, int]] = []  # (cmd, count, param_start)
    p = 0
    total_params = 0
    while p < n:
        ci = int(g[p])
        cmd = ci & 0x7
        count = ci >> 3
        p += 1
        if cmd in (CMD_MOVE_TO, CMD_LINE_TO):
            headers.append((cmd, count, p))
            p += 2 * count
            total_params += count
        elif cmd == CMD_CLOSE_PATH:
            headers.append((cmd, count, p))
        else:
            raise GeometryError(f"unknown command {cmd}")  # DecodeGeometry.cs:84-87
    if p != n:
        raise GeometryError("command stream overruns buffer")

    if total_params == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
            np.zeros(1, dtype=np.int64),
        )

    # Vectorized cursor decode of ALL MoveTo/LineTo params in stream order.
    dx = np.empty(total_params, dtype=np.int64)
    dy = np.empty(total_params, dtype=np.int64)
    w = 0
    for cmd, count, ps in headers:
        if cmd == CMD_CLOSE_PATH:
            continue
        params = g[ps : ps + 2 * count].astype(np.int64)
        dx[w : w + count] = zigzag_decode(params[0::2])
        dy[w : w + count] = zigzag_decode(params[1::2])
        w += count
    xs_all = np.cumsum(dx)
    ys_all = np.cumsum(dy)

    # Second pass: assemble parts (MoveTo flushes the open part; ClosePath
    # re-appends the part's first vertex).
    part_slices: list[tuple[int, int]] = []  # (start, end) into xs_all
    closed: list[bool] = []
    cur_start = -1
    w = 0
    for cmd, count, _ in headers:
        if cmd == CMD_MOVE_TO:
            if cur_start >= 0:
                part_slices.append((cur_start, w))
                closed.append(False)
            cur_start = w
            w += count
        elif cmd == CMD_LINE_TO:
            if cur_start < 0:
                cur_start = w
            w += count
        else:  # ClosePath
            if cur_start < 0:
                raise GeometryError("ClosePath with no open part")
            part_slices.append((cur_start, w))
            closed.append(True)
            cur_start = -1
    if cur_start >= 0:
        part_slices.append((cur_start, w))
        closed.append(False)

    sizes = np.array(
        [(e - s) + (1 if c else 0) for (s, e), c in zip(part_slices, closed)],
        dtype=np.int64,
    )
    offsets = np.zeros(sizes.size + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])
    xs = np.empty(int(offsets[-1]), dtype=np.int64)
    ys = np.empty(int(offsets[-1]), dtype=np.int64)
    for i, ((s, e), c) in enumerate(zip(part_slices, closed)):
        o = offsets[i]
        m = e - s
        xs[o : o + m] = xs_all[s:e]
        ys[o : o + m] = ys_all[s:e]
        if c:  # explicit ring closure — DecodeGeometry.cs:76-82
            xs[o + m] = xs_all[s]
            ys[o + m] = ys_all[s]
    return xs, ys, offsets


def encode_commands(
    xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray, geom_type: int
) -> np.ndarray:
    """Inverse of :func:`decode_commands` → packed command integers (uint32).

    Accepts parts in the decoded convention (polygon rings explicitly
    closed, first == last); drops the duplicate closing vertex and emits
    ClosePath, so encode∘decode round-trips byte-exactly.
    """
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    nparts = offsets.size - 1
    out: list[np.ndarray] = []
    cx = 0
    cy = 0
    if geom_type == GEOM_POINT:
        # single MoveTo header with count = total points
        px = xs
        py = ys
        dx = np.diff(np.concatenate(([cx], px)))
        dy = np.diff(np.concatenate(([cy], py)))
        params = np.empty(2 * px.size, dtype=np.int64)
        params[0::2] = zigzag_encode(dx)
        params[1::2] = zigzag_encode(dy)
        header = np.array([(px.size << 3) | CMD_MOVE_TO], dtype=np.uint32)
        return np.concatenate([header, params.astype(np.uint32)])

    for i in range(nparts):
        s, e = int(offsets[i]), int(offsets[i + 1])
        px = xs[s:e]
        py = ys[s:e]
        is_ring = geom_type == GEOM_POLYGON
        if is_ring:
            if e - s < 2 or px[-1] != px[0] or py[-1] != py[0]:
                raise GeometryError("polygon ring must be explicitly closed")
            px = px[:-1]
            py = py[:-1]
        m = px.size
        if m == 0:
            continue
        dx = np.diff(np.concatenate(([cx], px)))
        dy = np.diff(np.concatenate(([cy], py)))
        zx = zigzag_encode(dx)
        zy = zigzag_encode(dy)
        move = np.array(
            [(1 << 3) | CMD_MOVE_TO, zx[0], zy[0]], dtype=np.uint32
        )
        seq = [move]
        if m > 1:
            rest = np.empty(2 * (m - 1), dtype=np.int64)
            rest[0::2] = zx[1:]
            rest[1::2] = zy[1:]
            seq.append(
                np.concatenate(
                    [
                        np.array([((m - 1) << 3) | CMD_LINE_TO], dtype=np.uint32),
                        rest.astype(np.uint32),
                    ]
                )
            )
        if is_ring:
            seq.append(np.array([(1 << 3) | CMD_CLOSE_PATH], dtype=np.uint32))
        out.extend(seq)
        cx, cy = int(px[-1]), int(py[-1])
    if not out:
        return np.empty(0, dtype=np.uint32)
    return np.concatenate(out)


def scale_coords(v: np.ndarray, scale: float, target: str = "long") -> np.ndarray:
    """Scale<T> semantics: multiply then convert.

    Integer targets use round-half-to-even (``Convert.ToInt64`` = banker's
    rounding = ``np.rint``). ref: src/Geometry/DecodeGeometry.cs:101-144.
    """
    scaled = np.asarray(v, dtype=np.float64) * float(scale)
    if target == "float":
        return scaled.astype(np.float32)
    if target == "int":
        return np.rint(scaled).astype(np.int32)
    if target == "long":
        if scale == 1.0:
            return np.asarray(v, dtype=np.int64)
        return np.rint(scaled).astype(np.int64)
    raise ValueError(f"unknown target {target}")


def signed_area(xs: np.ndarray, ys: np.ndarray) -> float:
    """Shoelace signed area over one ring (closed or open input both fine).

    Matches src/VectorTileReader/VectorTileFeature.cs:130-141: the
    reference sums over consecutive pairs of the *closed* ring
    (x[i]*y[i+1] - x[i+1]*y[i]) / 2 with positive = counter-clockwise in
    tile coords (y down), i.e. inner rings have area >= 0
    (VectorTileFeature.cs:97).
    """
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    if x.size < 3:
        return 0.0
    if x[-1] != x[0] or y[-1] != y[0]:
        x = np.concatenate([x, x[:1]])
        y = np.concatenate([y, y[:1]])
    return float(0.5 * np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def point_in_polygon(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Vectorized crossing-rule point-in-polygon over MANY points, ONE ring.

    Returns int8 array: 0 outside, 1 inside, -1 exactly on the boundary —
    the reference's result convention (src/Geometry/clipper.cs:4025-4077,
    Hormann–Agathos). Integer-exact when inputs are integer (int64 cross
    products, no floating error), like the reference's IntPoint math.
    """
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    rx = np.asarray(ring_x, dtype=np.int64)
    ry = np.asarray(ring_y, dtype=np.int64)
    if rx.size >= 2 and rx[-1] == rx[0] and ry[-1] == ry[0]:
        rx = rx[:-1]
        ry = ry[:-1]
    n = rx.size
    if n < 3:
        return np.zeros(px.shape, dtype=np.int8)

    result = np.zeros(px.shape, dtype=np.int8)
    boundary = np.zeros(px.shape, dtype=bool)
    winding = np.zeros(px.shape, dtype=np.int64)

    x1 = rx
    y1 = ry
    x2 = np.roll(rx, -1)
    y2 = np.roll(ry, -1)

    # Broadcast points (N,1) against edges (E,) in manageable chunks.
    CHUNK = 4096
    for s in range(0, px.size, CHUNK):
        e = min(s + CHUNK, px.size)
        X = px[s:e, None]
        Y = py[s:e, None]
        # boundary: point collinear with edge and within bbox
        cross = (x2 - x1) * (Y - y1) - (y2 - y1) * (X - x1)
        on_seg = (
            (cross == 0)
            & (np.minimum(x1, x2) <= X)
            & (X <= np.maximum(x1, x2))
            & (np.minimum(y1, y2) <= Y)
            & (Y <= np.maximum(y1, y2))
        )
        boundary[s:e] = on_seg.any(axis=1)
        # crossing rule: edge crosses the horizontal ray to the right of X
        upward = (y1 <= Y) & (y2 > Y)
        downward = (y1 > Y) & (y2 <= Y)
        winding[s:e] = np.sum(upward & (cross > 0), axis=1) - np.sum(
            downward & (cross < 0), axis=1
        )
    inside = winding != 0  # nonzero fill rule (clipper pftNonZero default)
    result[inside] = 1
    result[boundary] = -1
    return result


def point_in_polygon_multi(
    px: np.ndarray,
    py: np.ndarray,
    ring_idx: np.ndarray,
    ring_offsets: np.ndarray,
    ring_x_flat: np.ndarray,
    ring_y_flat: np.ndarray,
) -> np.ndarray:
    """PIP where EACH point row tests against its OWN ring (J4 phase 2 at
    batch granularity): ``ring_idx[i]`` selects ring ``i``'s vertex span
    ``ring_offsets[r]:ring_offsets[r+1]`` in the flat arrays. Same
    {0,1,-1} Hormann–Agathos semantics as :func:`point_in_polygon`
    (src/Geometry/clipper.cs:4025-4077), integer-exact.

    Fast path: when every referenced ring has the same vertex count E
    (the tile-rectangle case), gathers per-row edge matrices of shape
    (N, E) and evaluates the whole batch in ONE vectorized pass — no
    per-group Python loop at all. Ragged ring sizes fall back to a
    per-distinct-ring loop (one kernel call per ring, many points each).

    Closing vertices (first == last) are handled by the edge roll: the
    duplicate edge has zero length and contributes nothing to winding,
    and its boundary test is subsumed by the real edges.
    """
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    ring_idx = np.asarray(ring_idx, dtype=np.int64)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    rxf = np.asarray(ring_x_flat, dtype=np.int64)
    ryf = np.asarray(ring_y_flat, dtype=np.int64)
    n = px.size
    out = np.zeros(n, dtype=np.int8)
    if n == 0:
        return out

    sizes = ring_offsets[ring_idx + 1] - ring_offsets[ring_idx]
    esz = sizes[0]
    if not (sizes == esz).all() or esz < 3:
        # ragged fallback: one vectorized call per distinct ring
        for r in np.unique(ring_idx):
            sel = ring_idx == r
            s, e = int(ring_offsets[r]), int(ring_offsets[r + 1])
            out[sel] = point_in_polygon(px[sel], py[sel], rxf[s:e], ryf[s:e])
        return out

    # uniform-size fast path: per-row edge gather, whole batch at once
    base = ring_offsets[ring_idx]  # (N,)
    cols = np.arange(esz, dtype=np.int64)  # (E,)
    vi = base[:, None] + cols[None, :]  # (N, E) vertex indices
    x1 = rxf[vi]
    y1 = ryf[vi]
    roll = np.concatenate([cols[1:], cols[:1]])
    vj = base[:, None] + roll[None, :]
    x2 = rxf[vj]
    y2 = ryf[vj]

    X = px[:, None]
    Y = py[:, None]
    CHUNK = 65536
    boundary = np.zeros(n, dtype=bool)
    winding = np.zeros(n, dtype=np.int64)
    for s in range(0, n, CHUNK):
        e = min(s + CHUNK, n)
        c = slice(s, e)
        cross = (x2[c] - x1[c]) * (Y[c] - y1[c]) - (y2[c] - y1[c]) * (X[c] - x1[c])
        on_seg = (
            (cross == 0)
            & (np.minimum(x1[c], x2[c]) <= X[c])
            & (X[c] <= np.maximum(x1[c], x2[c]))
            & (np.minimum(y1[c], y2[c]) <= Y[c])
            & (Y[c] <= np.maximum(y1[c], y2[c]))
        )
        boundary[c] = on_seg.any(axis=1)
        upward = (y1[c] <= Y[c]) & (y2[c] > Y[c])
        downward = (y1[c] > Y[c]) & (y2[c] <= Y[c])
        winding[c] = np.sum(upward & (cross > 0), axis=1) - np.sum(
            downward & (cross < 0), axis=1
        )
    out[winding != 0] = 1
    out[boundary] = -1
    return out


# ---------------------------------------------------------------------------
# rectangle clipping (ref: src/Geometry/Util.cs:29-157 — clip target is
# always the axis-aligned rect [-buffer, extent+buffer]^2, Util.cs:80-83)
# ---------------------------------------------------------------------------

def clip_points(
    xs: np.ndarray, ys: np.ndarray, extent: int, buffer: int
) -> tuple[np.ndarray, np.ndarray]:
    """Drop points outside [-buf, extent+buf]². ref: Util.cs:42-68."""
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    lo = -buffer
    hi = extent + buffer
    keep = (xs >= lo) & (xs <= hi) & (ys >= lo) & (ys <= hi)
    return xs[keep], ys[keep]


def _clip_ring_halfplane(
    x: np.ndarray, y: np.ndarray, axis: int, bound: int, keep_le: bool
) -> tuple[np.ndarray, np.ndarray]:
    """Sutherland–Hodgman against one half-plane (open ring input)."""
    if x.size == 0:
        return x, y
    v = x if axis == 0 else y
    inside = (v <= bound) if keep_le else (v >= bound)
    nx: list[float] = []
    ny: list[float] = []
    n = x.size
    for i in range(n):
        j = (i + 1) % n
        if inside[i]:
            nx.append(x[i])
            ny.append(y[i])
        if inside[i] != inside[j]:
            vi = v[i]
            vj = v[j]
            t = (bound - vi) / (vj - vi)
            nx.append(x[i] + t * (x[j] - x[i]))
            ny.append(y[i] + t * (y[j] - y[i]))
    return np.asarray(nx, dtype=np.float64), np.asarray(ny, dtype=np.float64)


def clip_ring(
    xs: np.ndarray, ys: np.ndarray, extent: int, buffer: int
) -> tuple[np.ndarray, np.ndarray]:
    """Clip one polygon ring to the rect, returning a CLOSED ring
    (first == last, integer coords) or empty arrays.

    Reference path: Clipper ctIntersection vs rect then re-close
    (Util.cs:75-157); an axis-aligned rect clip of a simple ring via
    Sutherland–Hodgman is equivalent for the supported inputs.
    """
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    if x.size >= 2 and x[-1] == x[0] and y[-1] == y[0]:
        x = x[:-1]
        y = y[:-1]
    lo = float(-buffer)
    hi = float(extent + buffer)
    for axis, bound, keep_le in (
        (0, hi, True),
        (0, lo, False),
        (1, hi, True),
        (1, lo, False),
    ):
        x, y = _clip_ring_halfplane(x, y, axis, bound, keep_le)
        if x.size == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    xi = np.rint(x).astype(np.int64)
    yi = np.rint(y).astype(np.int64)
    # drop consecutive duplicates introduced by rounding
    keep = np.ones(xi.size, dtype=bool)
    keep[1:] = (xi[1:] != xi[:-1]) | (yi[1:] != yi[:-1])
    xi = xi[keep]
    yi = yi[keep]
    if xi.size >= 2 and xi[0] == xi[-1] and yi[0] == yi[-1]:
        xi = xi[:-1]
        yi = yi[:-1]
    if xi.size < 3:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    # re-close (decoded-ring convention, Util.cs:131-147)
    return np.concatenate([xi, xi[:1]]), np.concatenate([yi, yi[:1]])


def clip_line(
    xs: np.ndarray, ys: np.ndarray, extent: int, buffer: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Liang–Barsky clip of a polyline to the rect → list of sub-lines."""
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    lo = float(-buffer)
    hi = float(extent + buffer)
    parts: list[tuple[list[float], list[float]]] = []
    cur_x: list[float] = []
    cur_y: list[float] = []
    for i in range(x.size - 1):
        x0, y0, x1, y1 = x[i], y[i], x[i + 1], y[i + 1]
        t0, t1 = 0.0, 1.0
        dx = x1 - x0
        dy = y1 - y0
        ok = True
        for p, q in (
            (-dx, x0 - lo),
            (dx, hi - x0),
            (-dy, y0 - lo),
            (dy, hi - y0),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
                continue
            r = q / p
            if p < 0:
                if r > t1:
                    ok = False
                    break
                t0 = max(t0, r)
            else:
                if r < t0:
                    ok = False
                    break
                t1 = min(t1, r)
        if not ok:
            if cur_x:
                parts.append((cur_x, cur_y))
                cur_x, cur_y = [], []
            continue
        sx, sy = x0 + t0 * dx, y0 + t0 * dy
        ex, ey = x0 + t1 * dx, y0 + t1 * dy
        if not cur_x or cur_x[-1] != sx or cur_y[-1] != sy:
            if cur_x:
                parts.append((cur_x, cur_y))
            cur_x, cur_y = [sx], [sy]
        cur_x.append(ex)
        cur_y.append(ey)
        if t1 < 1.0:
            parts.append((cur_x, cur_y))
            cur_x, cur_y = [], []
    if cur_x:
        parts.append((cur_x, cur_y))
    return [
        (np.rint(np.asarray(a)).astype(np.int64), np.rint(np.asarray(b)).astype(np.int64))
        for a, b in parts
        if len(a) >= 2
    ]


def offset_convex_rings(
    xs: np.ndarray,
    ys: np.ndarray,
    offsets: np.ndarray,
    d: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Miter offset of strictly-convex CCW rings by distance ``d`` (D17
    — the reference vendors clipper's ClipperOffset/Minkowski, dead
    code per SURVEY §2.8; this is the Spark-first restricted-domain
    re-expression: convex rings, miter joins, where the result is pure
    per-vertex arithmetic a SQL oracle can replay bit-for-bit).

    Each output vertex is the intersection of the two adjacent edges'
    offset lines (edge normals point outward for CCW orientation in a
    y-up frame). Whole-batch vectorized over flat ring arrays; raises
    if any corner is non-convex/collinear (den <= 0) — offsetting a
    non-convex ring needs the full polygon-clipping machinery the
    reference itself never invokes.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offsets = np.asarray(offsets, dtype=np.int64)
    ln = np.diff(offsets)
    if (ln < 3).any():
        raise ValueError("rings need >= 3 vertices")
    idx = np.arange(len(xs), dtype=np.int64)
    s = np.repeat(offsets[:-1], ln)
    ll = np.repeat(ln, ln)
    prev = s + (idx - s - 1) % ll
    nxt = s + (idx - s + 1) % ll
    pxv, pyv = xs[prev], ys[prev]
    nxv, nyv = xs[nxt], ys[nxt]
    e1x, e1y = xs - pxv, ys - pyv
    e2x, e2y = nxv - xs, nyv - ys
    l1 = np.sqrt(e1x * e1x + e1y * e1y)
    l2 = np.sqrt(e2x * e2x + e2y * e2y)
    p1x = pxv + d * (e1y / l1)
    p1y = pyv - d * (e1x / l1)
    p2x = xs + d * (e2y / l2)
    p2y = ys - d * (e2x / l2)
    den = e1x * e2y - e1y * e2x
    if (den <= 0).any():
        raise ValueError("rings must be strictly convex CCW")
    t = ((p2x - p1x) * e2y - (p2y - p1y) * e2x) / den
    return p1x + t * e1x, p1y + t * e1y
