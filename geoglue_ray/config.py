"""Task configuration — the engine's "query plan" surface.

Mirrors the reference's config layer (``config.py:26-197``): variable
bounds specs, ``<shapefile>::<pk>`` inline syntax, logfmt-serializable
zonal-stats task configs (round-trip via ``from_str``), operation aliases
(``cli.py:278``), and region metadata validation with the reference's
timezone regex ``[+-][01]\\d:([03]0|45)`` and in-range bbox requirement
(``region.py:375-426``).
"""

from __future__ import annotations

import re
import shlex
from dataclasses import dataclass, field
from pathlib import Path

from geoglue_ray.functions.logfmt import logfmt_escape

TZ_RE = re.compile(r"^[+-][01]\d:([03]0|45)$")
RESAMPLE_TYPES = ("remapnn", "remapbil", "remapdis", "sremapbil", "off")


@dataclass
class VariableSpec:
    """Per-variable validity bounds (``config.py:26-38``)."""

    min: float | None = 0.0
    max: float | None = None
    max_na_frac: float = 0.0

    def validate(self) -> None:
        if self.min is not None and self.max is not None and float(self.min) > float(self.max):
            raise ValueError(f"min ({self.min}) > max ({self.max})")
        if not 0.0 <= self.max_na_frac <= 1.0:
            raise ValueError(f"max_na_frac must be between 0 and 1 (got {self.max_na_frac})")


@dataclass(frozen=True)
class ShapefileConfig:
    """``<shapefile_path>::<pk>`` inline syntax (``config.py:41-53``)."""

    file: Path
    pk: str

    @staticmethod
    def from_str(s: str) -> "ShapefileConfig":
        parts = s.split("::")
        if len(parts) != 2:
            raise ValueError("expected <shapefile_path>::<shapefile_id>")
        return ShapefileConfig(Path(parts[0]), parts[1])


@dataclass(frozen=True)
class ZonalStatsConfig:
    """logfmt-round-trippable zonal task config (``config.py:126-197``)."""

    raster: Path
    shapefile: Path
    shapefile_id: str
    output: Path
    operation: str
    weights: Path | None = None
    resample: str = "off"

    def __str__(self) -> str:
        return " ".join(
            [
                f"raster={logfmt_escape(str(self.raster))}",
                f"shapefile={logfmt_escape(str(self.shapefile))}",
                f"shapefile_id={self.shapefile_id}",
                f"output={logfmt_escape(str(self.output))}",
                f"operation={self.operation}",
                f"weights={logfmt_escape(str(self.weights))}",
                f"resample={self.resample}",
            ]
        )

    @staticmethod
    def from_str(s: str) -> "ZonalStatsConfig":
        kv = {}
        for p in shlex.split(s):
            k, _, v = p.partition("=")
            kv[k] = v
        required = ["raster", "shapefile", "shapefile_id", "output", "operation", "resample"]
        if any(k not in kv for k in required):
            raise KeyError(f"Missing required key, should have {required}")
        w = kv.get("weights")
        return ZonalStatsConfig(
            raster=Path(kv["raster"]),
            shapefile=Path(kv["shapefile"]),
            shapefile_id=kv["shapefile_id"],
            output=Path(kv["output"]),
            operation=kv["operation"],
            resample=kv["resample"],
            weights=Path(w) if w and w != "None" else None,
        )


@dataclass(frozen=True)
class RegionMeta:
    """Region metadata with the reference's validation (``region.py:375-426``)."""

    name: str
    iso3: str
    tz: str
    bbox: tuple[float, float, float, float]
    url: str = "https://example.org"

    def __post_init__(self):
        if not re.fullmatch(r"[A-Z]{3}", self.iso3):
            raise ValueError(f"invalid ISO3 {self.iso3!r}")
        if not TZ_RE.fullmatch(self.tz):
            raise ValueError(f"invalid timezone offset {self.tz!r}")
        minx, miny, maxx, maxy = self.bbox
        if not (-180 <= minx < maxx <= 180 and -90 <= miny < maxy <= 90):
            raise ValueError(f"bbox out of range: {self.bbox}")
        if not self.url.startswith("https://"):
            raise ValueError("url must be https")

    @property
    def tz_hours(self) -> int | None:
        """``+05:00 -> 5``; fractional offsets -> None (``cds.py:64-86``)."""
        sign = 1 if self.tz[0] == "+" else -1
        hh, mm = int(self.tz[1:3]), int(self.tz[4:6])
        if mm != 0:
            return None
        return sign * hh


def parse_region_name(s: str) -> tuple[str, int]:
    """``"VNM-2" -> ("VNM", 2)`` (``region.py:370-374``)."""
    name, _, admin = s.partition("-")
    return name, int(admin)


@dataclass
class GeoglueConfig:
    """Catalog: op aliases + region registry (``config.py:67-104``)."""

    operation: dict[str, str] = field(default_factory=dict)
    region: dict[str, ShapefileConfig] = field(default_factory=dict)

    def resolve_op(self, op: str) -> str:
        return self.operation.get(op, op)
