"""Choropleth rendering of per-admin statistics.

The engine's equivalent of the reference's ``plot()``
(``/root/reference/src/geoglue/plot.py:22-76``): join per-region values
onto the admin geometry by key (never positionally) and render a
choropleth.  The reference delegates to geopandas/matplotlib; neither is
in this environment, so rendering is a dependency-free SVG writer — the
same join-then-colormap semantics, producing a reviewable artifact from
any worker or the driver.

Rendering is a driver-side finishing step over the SMALL aggregated
result (one row per admin unit), never part of a data pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geoglue_ray.geom import parse_wkb
from geoglue_ray.sources.admin import attach_geometry

# viridis anchor colors (public-domain colormap data, CC0), linearly
# interpolated — enough fidelity for a review artifact
_VIRIDIS = np.array(
    [
        (68, 1, 84),
        (71, 44, 122),
        (59, 81, 139),
        (44, 113, 142),
        (33, 144, 141),
        (39, 173, 129),
        (92, 200, 99),
        (170, 220, 50),
        (253, 231, 37),
    ],
    dtype=np.float64,
)
_MISSING_FILL = "#cccccc"


def _colormap(t: np.ndarray) -> list[str]:
    """t in [0,1] -> interpolated viridis hex strings (NaN -> grey)."""
    t = np.asarray(t, dtype=np.float64)
    bad = ~np.isfinite(t)
    tt = np.clip(np.where(bad, 0.0, t), 0.0, 1.0) * (len(_VIRIDIS) - 1)
    i = np.minimum(tt.astype(np.int64), len(_VIRIDIS) - 2)
    frac = (tt - i)[:, None]
    rgb = (_VIRIDIS[i] * (1 - frac) + _VIRIDIS[i + 1] * frac).round().astype(np.int64)
    out = [f"#{r:02x}{g:02x}{b:02x}" for r, g, b in rgb]
    for j in np.nonzero(bad)[0]:
        out[j] = _MISSING_FILL
    return out


def choropleth_svg(
    stats: pa.Table,
    value_col: str,
    admin: pa.Table | None = None,
    width: int = 640,
    title: str | None = None,
) -> str:
    """Per-admin stats (must carry ``admin_id``) -> SVG choropleth string.

    Geometry is attached by the keyed ``admin_id`` join
    (``attach_geometry``, the ``plot.py:62-63`` equivalent); values are
    min-max scaled onto the viridis ramp; null/NaN regions render grey
    (the reference's missing-region behaviour)."""
    t = attach_geometry(stats, admin)
    vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
    finite = vals[np.isfinite(vals)]
    lo, hi = (finite.min(), finite.max()) if len(finite) else (0.0, 1.0)
    span = (hi - lo) or 1.0
    fills = _colormap((vals - lo) / span)

    wkbs = t["geometry_wkb"].to_pylist()
    all_pts = np.concatenate(
        [ring for buf in wkbs for rings in parse_wkb(buf) for ring in rings]
    )
    minx, miny = all_pts.min(axis=0)
    maxx, maxy = all_pts.max(axis=0)
    sx = width / ((maxx - minx) or 1.0)
    height = int(np.ceil((maxy - miny) * sx)) or 1

    def path_d(buf: bytes) -> str:
        parts = []
        for rings in parse_wkb(buf):
            for ring in rings:
                x = (ring[:, 0] - minx) * sx
                y = height - (ring[:, 1] - miny) * sx  # SVG y grows downward
                pts = " L".join(f"{a:.2f},{b:.2f}" for a, b in zip(x, y))
                parts.append(f"M{pts} Z")
        return " ".join(parts)

    from xml.sax.saxutils import escape

    rows = [
        f'<path d="{path_d(buf)}" fill="{fill}" stroke="#333" stroke-width="0.3">'
        f"<title>{escape(str(aid))}: {val}</title></path>"
        for buf, fill, aid, val in zip(
            wkbs, fills, t["admin_id"].to_pylist(), vals.tolist()
        )
    ]
    head = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
        f'height="{height + 24}" viewBox="0 0 {width} {height + 24}">'
    )
    legend = (
        f'<text x="4" y="{height + 16}" font-size="12">'
        f"{escape(str(title or value_col))}: {lo:g} – {hi:g}</text>"
    )
    return head + "".join(rows) + legend + "</svg>"


def write_choropleth(
    stats: pa.Table, value_col: str, out_path: str, **kwargs
) -> str:
    svg = choropleth_svg(stats, value_col, **kwargs)
    with open(out_path, "w") as f:
        f.write(svg)
    return out_path
