"""GGrid — hierarchical global grid cells (the engine's H3/S2 stand-in).

The north_star calls for encoding document coordinates to H3 cells with an
S2 covering on the polygon side; neither library is available here, so the
engine uses an equivalent hierarchical equirectangular grid: resolution
``r`` divides lon [-180,180) x lat [-90,90) into ``2**r x 2**(r-1)`` cells.
Cell ids pack ``(res, x, y)`` into one int64, so a column of cells is a
plain Arrow int64 column and parent/child moves are bit shifts — the same
properties the design relies on from H3 (point->cell is O(1) vectorized,
coarse cells contain fine cells, neighbor rings are cheap).

Resolution guide: r=13 -> ~0.044 deg (~4.9 km) cells; r=16 -> ~0.0055 deg.
"""

from __future__ import annotations

import numpy as np

_RES_BITS = 5
_XY_BITS = 29  # supports res <= 29
RES_SHIFT = 2 * _XY_BITS  # public: res field position in a cell id


def res_of(cell: np.ndarray | int) -> np.ndarray | int:
    """Resolution encoded in cell id(s)."""
    if np.isscalar(cell):
        return int(cell) >> RES_SHIFT
    return np.asarray(cell, dtype=np.int64) >> RES_SHIFT


def encode(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Vectorized point -> cell id at resolution ``res``."""
    n = 1 << res
    x = np.clip(((np.asarray(lon) + 180.0) / 360.0 * n).astype(np.int64), 0, n - 1)
    y = np.clip(((np.asarray(lat) + 90.0) / 180.0 * (n >> 1)).astype(np.int64), 0, (n >> 1) - 1)
    return (np.int64(res) << (2 * _XY_BITS)) | (y << _XY_BITS) | x


def decode(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (res, x, y)."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell >> (2 * _XY_BITS)
    y = (cell >> _XY_BITS) & ((1 << _XY_BITS) - 1)
    x = cell & ((1 << _XY_BITS) - 1)
    return res, x, y


def cell_bounds(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell id -> (minx, miny, maxx, maxy)."""
    res, x, y = decode(cell)
    n = (np.int64(1) << res).astype(np.float64)
    dx, dy = 360.0 / n, 180.0 / (n / 2)
    minx = -180.0 + x * dx
    miny = -90.0 + y * dy
    return minx, miny, minx + dx, miny + dy


def parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    res, x, y = decode(cell)
    shift = res - parent_res
    return (
        (np.int64(parent_res) << (2 * _XY_BITS)) | ((y >> shift) << _XY_BITS) | (x >> shift)
    )


def xy_to_cell(x: np.ndarray, y: np.ndarray, res: int) -> np.ndarray:
    return (np.int64(res) << (2 * _XY_BITS)) | (np.asarray(y, np.int64) << _XY_BITS) | np.asarray(x, np.int64)


def ring(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (incl. center) — kNN ring search."""
    res, x, y = decode(np.asarray([cell]))
    res, x, y = int(res[0]), int(x[0]), int(y[0])
    n = 1 << res
    xs = (np.arange(x - k, x + k + 1) % n)  # wrap longitude
    ys = np.arange(max(0, y - k), min((n >> 1) - 1, y + k) + 1)
    gx, gy = np.meshgrid(xs, ys)
    return xy_to_cell(gx.ravel(), gy.ravel(), res)


def cover_bbox(minx: float, miny: float, maxx: float, maxy: float, res: int) -> np.ndarray:
    """All cells at ``res`` intersecting the (half-open) bbox — the polygon-side
    covering used to build the candidate index (S2-covering equivalent)."""
    n = 1 << res
    eps = 1e-12
    x0 = int(np.clip(np.floor((minx + 180.0) / 360.0 * n), 0, n - 1))
    x1 = int(np.clip(np.floor((maxx - eps + 180.0) / 360.0 * n), 0, n - 1))
    y0 = int(np.clip(np.floor((miny + 90.0) / 180.0 * (n >> 1)), 0, (n >> 1) - 1))
    y1 = int(np.clip(np.floor((maxy - eps + 90.0) / 180.0 * (n >> 1)), 0, (n >> 1) - 1))
    gx, gy = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
    return xy_to_cell(gx.ravel(), gy.ravel(), res)


_ZM = (
    np.uint64(0x00FF00FF00FF00FF),
    np.uint64(0x0F0F0F0F0F0F0F0F),
    np.uint64(0x3333333333333333),
    np.uint64(0x5555555555555555),
)


def _spread16(x: np.ndarray) -> np.ndarray:
    """Spread the low 16 bits of each value to the even bit positions
    (classic Morton magic-number expansion)."""
    x = np.asarray(x).astype(np.uint64) & np.uint64(0xFFFF)
    x = (x | (x << np.uint64(8))) & _ZM[0]
    x = (x | (x << np.uint64(4))) & _ZM[1]
    x = (x | (x << np.uint64(2))) & _ZM[2]
    x = (x | (x << np.uint64(1))) & _ZM[3]
    return x


def zorder_key(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Morton / Z-order interleave of two <=16-bit grid coordinates —
    the locality-preserving sort/partition key for spatial layouts:
    sorting (or range-partitioning output files) by this key keeps
    spatially-near cells in the same blocks, which is what makes
    spatial range reads prune at 100 TB.  x occupies the even bits, y
    the odd bits; int64 result (fits: 32 bits used)."""
    return (_spread16(x) | (_spread16(y) << np.uint64(1))).astype(np.int64)


def hilbert_key(x: np.ndarray, y: np.ndarray, order: int = 16) -> np.ndarray:
    """Hilbert-curve index of two ``order``-bit grid coordinates — the
    stronger locality key next to :func:`zorder_key` (a Hilbert walk
    never jumps, so range reads over sorted output touch ~half the
    blocks a Morton layout does at the same selectivity).  Classic
    iterative xy2d, vectorized over the whole column: per bit level
    ``s`` accumulate ``s*s * ((3*rx) XOR ry)`` and rotate/reflect the
    undecided low bits into the child quadrant's frame.  Low bits are
    masked each level (``& (s-1)``), so the reflection is exact integer
    arithmetic an SQL recursive CTE mirrors bit-for-bit.  int64 result
    (fits: 2*order <= 32 bits used)."""
    x = np.asarray(x).astype(np.int64)
    y = np.asarray(y).astype(np.int64)
    d = np.zeros(len(x), dtype=np.int64)
    s = np.int64(1) << np.int64(order - 1)
    while s > 0:
        rx = (x & s) > 0
        ry = (y & s) > 0
        quad = np.where(rx & ry, 2, np.where(rx, 3, np.where(ry, 1, 0)))
        d += s * s * quad
        xl = x & (s - 1)
        yl = y & (s - 1)
        nx = np.where(ry, xl, np.where(rx, s - 1 - yl, yl))
        ny = np.where(ry, yl, np.where(rx, s - 1 - xl, xl))
        x, y = nx, ny
        s >>= 1
    return d
