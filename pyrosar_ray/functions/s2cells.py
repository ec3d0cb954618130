"""S2-style hierarchical cell ids (cube-face Hilbert curve), pure numpy.

The north-star index slot: points and footprint covers on the S2
discrete global grid. This is a from-scratch vectorized implementation
of the publicly documented S2 scheme (s2geometry.io docs: quadratic
ST transform, face layout, Hilbert position tables):

* sphere point -> cube face (0..5) + (u, v) central projection
* quadratic ST transform s = f(u) flattening area distortion
* (face, i, j) -> 64-bit cell id via a level-by-level Hilbert walk
  (2 position bits per level, orientation swap/invert masks)
* id layout: 3 face bits | 2*level position bits | sentinel bit,
  exactly the public format (level-0 cell of face f == f<<61 | 1<<60)

Cell ids are computed in uint64 and viewcast to int64 for Arrow
transport — both join sides use the same cast, so equality joins and
searchsorted probes are unaffected by the sign reinterpretation.

The bbox cover (``cover_bbox_s2``) descends the cell tree breadth-first
with a *conservative* cell->lat/lon bound (corner bbox padded by the
cell diagonal arc; pole/antimeridian cells widen to the full lon
range), so it over-covers but never under-covers: every point whose
level-L cell intersects the query bbox is guaranteed to land in the
cover. The downstream exact refine removes the false positives —
results are bit-identical to the flat-grid plan.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30

_SWAP = 1
_INVERT = 2
# Public Hilbert lookup tables (s2geometry s2coords): position of each
# (i-bit, j-bit) sub-cell along the curve per orientation, the inverse,
# and the orientation delta contributed by each position.
_IJ_TO_POS = np.array(
    [[0, 1, 3, 2], [0, 3, 1, 2], [2, 3, 1, 0], [2, 1, 3, 0]], dtype=np.int64
)
_POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT | _SWAP], dtype=np.int64)


# ---------------------------------------------------------------- sphere


def lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    lam = np.radians(np.asarray(lon, dtype=np.float64))
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    cp = np.cos(phi)
    return cp * np.cos(lam), cp * np.sin(lam), np.sin(phi)


def xyz_to_lonlat(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    lon = np.degrees(np.arctan2(y, x))
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    return lon, lat


def xyz_to_face_uv(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    """Largest-|component| cube face + central projection (u, v)."""
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = np.where(comp >= 0, axis, axis + 3).astype(np.int64)
    # public face->(u,v) formulas (u = unum/comp, v = vnum/comp with the
    # dominant signed component as denominator — bit-identical to the
    # per-face spellings, but 2 divisions instead of 12):
    #   f0: y/x,  z/x   f1: -x/y, z/y   f2: -x/z, -y/z
    #   f3: z/x,  y/x   f4: z/y, -x/y   f5: -y/z, -x/z
    nx, ny = -x, -y
    unum = np.choose(face, [y, nx, nx, z, z, ny])
    vnum = np.choose(face, [z, z, ny, y, nx, nx])
    with np.errstate(divide="ignore", invalid="ignore"):
        return face, unum / comp, vnum / comp


def face_uv_to_xyz(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.choose(face % 6, xs)
    y = np.choose(face % 6, ys)
    z = np.choose(face % 6, zs)
    n = np.sqrt(x * x + y * y + z * z)
    return x / n, y / n, z / n


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic ST transform (public): equalizes cell areas."""
    with np.errstate(invalid="ignore"):  # unused where-branch sqrt(<0)
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


# ---------------------------------------------------------------- hilbert


# Two-level composed tables (the s2geometry lookup-batching trick):
# index = (bi1, bj1, bi2, bj2) packed high-to-low; one table lookup per
# TWO levels of the walk.
_IJ2_TO_POS4 = np.zeros((4, 16), dtype=np.uint64)
_IJ2_ORIENT = np.zeros((4, 16), dtype=np.int64)
for _o in range(4):
    for _ij in range(16):
        _p1 = int(_IJ_TO_POS[_o, _ij >> 2])
        _o1 = _o ^ int(_POS_TO_ORIENT[_p1])
        _p2 = int(_IJ_TO_POS[_o1, _ij & 3])
        _IJ2_TO_POS4[_o, _ij] = (_p1 << 2) | _p2
        _IJ2_ORIENT[_o, _ij] = _o1 ^ int(_POS_TO_ORIENT[_p2])
del _o, _ij, _p1, _o1, _p2


def hilbert_pos(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int):
    """(face, i, j at 2^level resolution) -> curve position (2*level bits).

    Walks TWO levels per iteration through the composed lookup tables
    (half the fancy-indexing passes of the 1-bit walk — this is the hot
    kernel of the point->cell encode)."""
    orient = (face & _SWAP).astype(np.int64)
    pos = np.zeros(len(face), dtype=np.uint64)
    k = int(level)
    if k % 2 == 1:
        k -= 1
        ij2 = 2 * ((i >> k) & 1) + ((j >> k) & 1)
        posbits = _IJ_TO_POS[orient, ij2]
        pos = (pos << np.uint64(2)) | posbits.astype(np.uint64)
        orient = orient ^ _POS_TO_ORIENT[posbits]
    while k > 0:
        k -= 2
        hi = 2 * ((i >> (k + 1)) & 1) + ((j >> (k + 1)) & 1)
        lo = 2 * ((i >> k) & 1) + ((j >> k) & 1)
        idx = hi * 4 + lo
        pos = (pos << np.uint64(4)) | _IJ2_TO_POS4[orient, idx]
        orient = _IJ2_ORIENT[orient, idx]
    return pos


def hilbert_ij(face: np.ndarray, pos: np.ndarray, level: int):
    """Inverse walk: curve position -> (i, j) at 2^level resolution."""
    orient = (face & _SWAP).astype(np.int64)
    i = np.zeros(len(face), dtype=np.int64)
    j = np.zeros(len(face), dtype=np.int64)
    for k in range(level - 1, -1, -1):
        posbits = ((pos >> np.uint64(2 * k)) & np.uint64(3)).astype(np.int64)
        ij2 = _POS_TO_IJ[orient, posbits]
        i = (i << 1) | (ij2 >> 1)
        j = (j << 1) | (ij2 & 1)
        orient = orient ^ _POS_TO_ORIENT[posbits]
    return i, j


# ---------------------------------------------------------------- cell ids


def _sentinel(level: int) -> np.uint64:
    return np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))


def fij_to_cell(face: np.ndarray, i: np.ndarray, j: np.ndarray, level: int):
    """(face, i, j at level) -> int64 cell id (public bit layout)."""
    pos = hilbert_pos(face, i, j, level)
    fid = face.astype(np.uint64) << np.uint64(2 * MAX_LEVEL + 1)
    cid = fid | (pos << np.uint64(2 * (MAX_LEVEL - level) + 1)) | _sentinel(level)
    return cid.view(np.int64)


def cell_to_fij(cell: np.ndarray, level: int):
    """int64 cell id at ``level`` -> (face, i, j)."""
    cid = np.asarray(cell, dtype=np.int64).view(np.uint64)
    face = (cid >> np.uint64(2 * MAX_LEVEL + 1)).astype(np.int64)
    pos = (cid >> np.uint64(2 * (MAX_LEVEL - level) + 1)) & (
        (np.uint64(1) << np.uint64(2 * level)) - np.uint64(1)
    )
    i, j = hilbert_ij(face, pos, level)
    return face, i, j


def cell_level(cell: np.ndarray) -> np.ndarray:
    """Level from the sentinel (lowest set) bit."""
    cid = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = cid & (~cid + np.uint64(1))
    # log2 of lsb via float is exact for powers of two < 2^53; the
    # sentinel can sit at bit 60 for level 0, so use a bit scan instead
    lev = np.zeros(len(cid), dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        lev[big] += shift
        v[big] >>= np.uint64(shift)
    return (MAX_LEVEL - (lev >> 1)).astype(np.int64)


def cell_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at ``level`` (clears the finer position bits)."""
    cid = np.asarray(cell, dtype=np.int64).view(np.uint64)
    new_lsb = _sentinel(level)
    parent = (cid & (~(new_lsb - np.uint64(1)) ^ new_lsb)) | new_lsb
    return parent.view(np.int64)


def cell_token(cell: np.ndarray) -> list[str]:
    """Hex token with trailing zeros stripped (the public token form)."""
    cid = np.asarray(cell, dtype=np.int64).view(np.uint64)
    return [format(int(c), "016x").rstrip("0") or "X" for c in cid]


def s2_cell_of_points(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """Containing S2 cell at ``level`` for each (lon, lat) point."""
    x, y, z = lonlat_to_xyz(lon, lat)
    face, u, v = xyz_to_face_uv(x, y, z)
    n = 1 << level
    i = np.clip((uv_to_st(u) * n).astype(np.int64), 0, n - 1)
    j = np.clip((uv_to_st(v) * n).astype(np.int64), 0, n - 1)
    return fij_to_cell(face, i, j, level)


# ---------------------------------------------------------------- cover

# Exact lat/lon extents of each face region (face 0 spans lon±45°,
# lat±45°; polar faces start at the corner latitude asin(1/sqrt(3))).
_POLE_LAT = np.degrees(np.arcsin(1.0 / np.sqrt(3.0)))  # 35.264…
_FACE_EPS = 1e-6  # boundary tie margin (superset-safe)

# u/v formulas per face over candidate xyz (valid for in-front points)


def _face_uv(face: int, x, y, z):
    if face == 0:
        return x, y / x, z / x
    if face == 1:
        return y, -x / y, z / y
    if face == 2:
        return z, -x / z, -y / z
    if face == 3:
        return -x, z / x, y / x
    if face == 4:
        return -y, z / y, -x / y
    return -z, -y / z, -x / z


def _face_mask(face: int, xmin, ymin, xmax, ymax):
    """Bboxes that can contain points assigned to ``face`` (superset)."""
    e = _FACE_EPS
    if face == 2:
        return ymax >= _POLE_LAT - e
    if face == 5:
        return ymin <= -_POLE_LAT + e
    lo, hi = {0: (-45.0, 45.0), 1: (45.0, 135.0), 4: (-135.0, -45.0)}.get(
        face, (135.0, 225.0)
    )
    lat_ok = (ymin <= 45.0 + e) & (ymax >= -45.0 - e)
    if face == 3:  # the antimeridian face: |lon| >= 135
        lon_ok = (xmax >= 135.0 - e) | (xmin <= -135.0 + e)
    else:
        lon_ok = (xmax >= lo - e) & (xmin <= hi + e)
    return lat_ok & lon_ok


_CARDINAL_LONS = np.array([-180.0, -90.0, 0.0, 90.0, 180.0])


def cover_bbox_s2(
    xmin: np.ndarray,
    ymin: np.ndarray,
    xmax: np.ndarray,
    ymax: np.ndarray,
    level: int,
):
    """Level-``level`` cell cover of each lat/lon bbox -> (row_idx, cells).

    Per face: project the bbox onto the face's (u, v) square through the
    candidate-point method — u and v over a lat/lon rectangle attain
    their extremes at box corners or on cardinal meridians (the only
    interior critical lines of the projection), so evaluating ≤14
    candidates bounds the range exactly. Clamping to [-1, 1] equals
    intersecting with the face; if the box straddles the face horizon
    (a candidate's face-axis component ≤ 0) the face's full square is
    used. The resulting ST/ij rectangle expands arithmetically (same
    repeat/offset pattern as the flat-grid cover) — O(output), no tree
    walk. Always a superset of the true cell set; the join's exact
    refine removes the padding.
    """
    xmin = np.asarray(xmin, dtype=np.float64)
    ymin = np.asarray(ymin, dtype=np.float64)
    xmax = np.asarray(xmax, dtype=np.float64)
    ymax = np.asarray(ymax, dtype=np.float64)
    nbox = len(xmin)
    z64 = np.zeros(0, dtype=np.int64)
    if nbox == 0:
        return z64, z64.copy()
    n = 1 << level
    out_row, out_face, out_i0, out_i1, out_j0, out_j1 = [], [], [], [], [], []
    for face in range(6):
        m = np.flatnonzero(_face_mask(face, xmin, ymin, xmax, ymax))
        if len(m) == 0:
            continue
        bx0, bx1 = xmin[m], xmax[m]
        by0, by1 = ymin[m], ymax[m]
        # candidate lons: box corners + in-range cardinal meridians
        lons = np.empty((len(m), 7))
        lons[:, 0] = bx0
        lons[:, 1] = bx1
        for k, c in enumerate(_CARDINAL_LONS):
            inside = (bx0 <= c) & (c <= bx1)
            lons[:, 2 + k] = np.where(inside, c, bx0)
        lon_c = np.concatenate([lons, lons], axis=1)  # x2 lat rows
        lat_c = np.concatenate(
            [np.repeat(by0[:, None], 7, axis=1), np.repeat(by1[:, None], 7, axis=1)],
            axis=1,
        )
        x, y, z = lonlat_to_xyz(lon_c, lat_c)
        with np.errstate(divide="ignore", invalid="ignore"):
            dot, u, v = _face_uv(face, x, y, z)
        behind = (dot <= _FACE_EPS).any(axis=1)
        umin = np.where(behind, -1.0, np.clip(u.min(axis=1), -1.0, 1.0))
        umax = np.where(behind, 1.0, np.clip(u.max(axis=1), -1.0, 1.0))
        vmin = np.where(behind, -1.0, np.clip(v.min(axis=1), -1.0, 1.0))
        vmax = np.where(behind, 1.0, np.clip(v.max(axis=1), -1.0, 1.0))
        keep = (umin <= umax) & (vmin <= vmax)
        if not keep.any():
            continue
        k = np.flatnonzero(keep)
        i0 = np.clip((uv_to_st(umin[k]) * n).astype(np.int64), 0, n - 1)
        i1 = np.clip((uv_to_st(umax[k]) * n).astype(np.int64), 0, n - 1)
        j0 = np.clip((uv_to_st(vmin[k]) * n).astype(np.int64), 0, n - 1)
        j1 = np.clip((uv_to_st(vmax[k]) * n).astype(np.int64), 0, n - 1)
        out_row.append(m[k])
        out_face.append(np.full(len(k), face, dtype=np.int64))
        out_i0.append(i0)
        out_i1.append(i1)
        out_j0.append(j0)
        out_j1.append(j1)
    if not out_row:
        return z64, z64.copy()
    row = np.concatenate(out_row)
    face_a = np.concatenate(out_face)
    i0 = np.concatenate(out_i0)
    i1 = np.concatenate(out_i1)
    j0 = np.concatenate(out_j0)
    j1 = np.concatenate(out_j1)
    # rectangle expansion (repeat/offset, no per-row loop)
    ni = i1 - i0 + 1
    nj = j1 - j0 + 1
    count = ni * nj
    total = int(count.sum())
    rep = np.repeat(np.arange(len(count), dtype=np.int64), count)
    offsets = np.concatenate([[0], np.cumsum(count)[:-1]])
    t = np.arange(total, dtype=np.int64) - np.repeat(offsets, count)
    nj_r = np.repeat(nj, count)
    ii = np.repeat(i0, count) + t // nj_r
    jj = np.repeat(j0, count) + t % nj_r
    return row[rep], fij_to_cell(face_a[rep], ii, jj, level)
