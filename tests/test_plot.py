"""Choropleth SVG rendering: keyed geometry join + colormap + geometry
fidelity (the engine's plot.py:22-76 equivalent, dependency-free)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from geoglue_ray import fixtures as fx
from geoglue_ray.plot import choropleth_svg, write_choropleth


def _stats(n: int = fx.N_ADMIN2) -> pa.Table:
    idx = np.arange(n, dtype=np.int64)
    vals = (idx % 97).astype(np.float64)
    vals[5] = np.nan  # a missing region renders grey
    return pa.table(
        {"admin_id": pa.array(fx.admin2_name(idx).tolist()), "v": pa.array(vals)}
    )


def test_choropleth_svg_structure():
    svg = choropleth_svg(_stats(), "v", title="fixture")
    root = ET.fromstring(svg)
    ns = "{http://www.w3.org/2000/svg}"
    paths = root.findall(f"{ns}path")
    assert len(paths) == fx.N_ADMIN2  # one polygon per admin unit
    fills = {p.get("fill") for p in paths}
    assert len(fills) > 10  # colormap actually varies
    assert "#cccccc" in fills  # NaN region is grey
    # every path is inside the viewBox
    w = float(root.get("width"))
    assert w == 640
    text = root.find(f"{ns}text")
    assert text is not None and "fixture" in text.text


def test_choropleth_subset_and_write(tmp_path):
    """A stats table covering a subset of regions joins by key, not
    position (shuffled input order must not change the mapping)."""
    idx = np.array([40, 3, 900], dtype=np.int64)
    t = pa.table(
        {
            "admin_id": pa.array(fx.admin2_name(idx).tolist()),
            "v": pa.array([1.0, 2.0, 3.0]),
        }
    )
    out = write_choropleth(t, "v", str(tmp_path / "m.svg"))
    svg = open(out).read()
    root = ET.fromstring(svg)
    paths = root.findall("{http://www.w3.org/2000/svg}path")
    assert len(paths) == 3
    titles = [p.find("{http://www.w3.org/2000/svg}title").text for p in paths]
    assert titles[0].startswith("ADM2-0040: 1")
    assert titles[2].startswith("ADM2-0900: 3")


def test_choropleth_escapes_xml_metacharacters():
    """Admin ids / titles containing &, <, > must yield well-formed SVG
    (escaped text, never markup injection)."""
    from geoglue_ray.sources.admin import build_admin_table

    admin = build_admin_table().slice(0, 2)
    evil = '<script>&"x"</script>'
    admin = admin.set_column(
        admin.schema.get_field_index("admin_id"),
        "admin_id",
        pa.array([evil, "ok"]),
    )
    t = pa.table({"admin_id": pa.array([evil, "ok"]), "v": pa.array([1.0, 2.0])})
    svg = choropleth_svg(t, "v", admin=admin, title="a & b < c")
    root = ET.fromstring(svg)  # raises on malformed XML
    title = root.find(
        "{http://www.w3.org/2000/svg}path/{http://www.w3.org/2000/svg}title"
    )
    assert title.text.startswith(evil)  # round-trips as TEXT, not markup
