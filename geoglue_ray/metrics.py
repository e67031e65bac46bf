"""Metric registry — the declarative per-variable statistics catalog.

Mirrors the reference's ``metrics.toml`` (``src/geoglue/metrics.toml:52-126``):
each metric declares its source, units, resampling choice, dependency
variables and the statistics to compute (``daily_mean`` / ``daily_max`` /
``daily_min`` / ``daily_sum``).  :func:`plan_metric` turns a registry entry
into the concrete engine plan (reducer ops + resample method +
dependencies), so a config-driven pipeline can be built without code.
TOML loading uses the stdlib ``tomllib``.
"""

from __future__ import annotations

from dataclasses import dataclass

_STAT_TO_OP = {
    "daily_mean": "mean",
    "daily_max": "max",
    "daily_min": "min",
    "daily_sum": "sum",
}


@dataclass(frozen=True)
class MetricSpec:
    name: str
    source: str
    description: str = ""
    units: str = ""
    statistics: tuple[str, ...] = ()
    resampling: str = "off"
    depends: tuple[str, ...] = ()

    def __post_init__(self):
        bad = [s for s in self.statistics if s not in _STAT_TO_OP]
        if bad:
            raise ValueError(f"unknown statistics {bad} (known: {sorted(_STAT_TO_OP)})")
        from geoglue_ray.config import RESAMPLE_TYPES

        if self.resampling not in RESAMPLE_TYPES:
            raise ValueError(f"unknown resampling {self.resampling!r}")

    @property
    def ops(self) -> list[str]:
        """Engine reducer ops for this metric's statistics."""
        return [_STAT_TO_OP[s] for s in self.statistics]


# built-in registry mirroring the reference's ERA5 entries
DEFAULT_METRICS: dict[str, MetricSpec] = {
    m.name: m
    for m in [
        MetricSpec(
            name="2m_temperature",
            source="era5",
            description="Air temperature",
            units="degree_Celsius",
            resampling="remapbil",
            statistics=("daily_mean", "daily_max", "daily_min"),
        ),
        MetricSpec(
            name="total_precipitation",
            source="era5",
            description="Total precipitation",
            units="m",
            statistics=("daily_sum",),
        ),
        MetricSpec(
            name="wind_speed",
            source="era5",
            description="Wind speed",
            units="m/s",
            statistics=("daily_mean",),
            depends=("10m_u_component_of_wind", "10m_v_component_of_wind"),
        ),
        MetricSpec(
            name="relative_humidity",
            source="era5",
            description="Relative humidity",
            units="unitless",
            statistics=("daily_mean", "daily_max", "daily_min"),
            depends=("2m_temperature", "2m_dewpoint_temperature", "surface_pressure"),
        ),
    ]
}


def load_metrics_toml(text: str) -> dict[str, MetricSpec]:
    """Parse a reference-shaped metrics.toml (``[source.metric]`` tables)."""
    import tomllib

    data = tomllib.loads(text)
    out: dict[str, MetricSpec] = {}
    for source, metrics in data.items():
        if source == "sources" or not isinstance(metrics, dict):
            continue
        for name, spec in metrics.items():
            if not isinstance(spec, dict) or "statistics" not in spec:
                continue
            out[name] = MetricSpec(
                name=name,
                source=source,
                description=spec.get("description", ""),
                units=spec.get("units", ""),
                statistics=tuple(spec.get("statistics", ())),
                resampling=spec.get("resampling", "off"),
                depends=tuple(spec.get("depends", ())),
            )
    return out


def plan_metric(name: str, registry: dict[str, MetricSpec] | None = None) -> dict:
    """Registry entry -> engine plan: reducer ops, resample method, deps.

    Dependencies are resolved transitively; a cycle raises.
    """
    reg = registry if registry is not None else DEFAULT_METRICS
    if name not in reg:
        raise KeyError(f"unknown metric {name!r} (have {sorted(reg)})")
    spec = reg[name]
    resolved: list[str] = []
    seen: set[str] = set()

    def visit(n: str, stack: tuple[str, ...]):
        if n in stack:
            raise ValueError(f"dependency cycle at {n!r}: {' -> '.join(stack + (n,))}")
        if n in seen:
            return
        seen.add(n)
        for d in reg[n].depends if n in reg else ():
            visit(d, stack + (n,))
        resolved.append(n)

    visit(name, ())
    return {
        "metric": name,
        "ops": spec.ops,
        "resampling": spec.resampling,
        "inputs": [d for d in resolved if d != name],
    }
