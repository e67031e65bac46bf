from __future__ import annotations

import pytest

from geoglue_ray.metrics import DEFAULT_METRICS, MetricSpec, load_metrics_toml, plan_metric


def test_default_registry_plans():
    p = plan_metric("2m_temperature")
    assert p["ops"] == ["mean", "max", "min"]
    assert p["resampling"] == "remapbil"
    assert p["inputs"] == []
    p2 = plan_metric("wind_speed")
    assert p2["ops"] == ["mean"]
    assert "10m_u_component_of_wind" in p2["inputs"]


def test_spec_validation():
    with pytest.raises(ValueError):
        MetricSpec(name="x", source="s", statistics=("daily_median",))
    with pytest.raises(ValueError):
        MetricSpec(name="x", source="s", resampling="remapfoo")
    with pytest.raises(KeyError):
        plan_metric("nope")


def test_dependency_cycle_detected():
    reg = {
        "a": MetricSpec(name="a", source="s", statistics=("daily_sum",), depends=("b",)),
        "b": MetricSpec(name="b", source="s", statistics=("daily_sum",), depends=("a",)),
    }
    with pytest.raises(ValueError):
        plan_metric("a", reg)


def test_load_metrics_toml():
    text = """
[sources.era5]
description = "ERA5"

[era5.total_precipitation]
description = "Total precipitation"
units = "m"
statistics = ["daily_sum"]

[era5.relative_humidity]
depends = ["2m_temperature"]
statistics = ["daily_mean", "daily_max"]
resampling = "remapdis"
"""
    reg = load_metrics_toml(text)
    assert set(reg) == {"total_precipitation", "relative_humidity"}
    assert reg["relative_humidity"].resampling == "remapdis"
    assert reg["relative_humidity"].depends == ("2m_temperature",)
    assert DEFAULT_METRICS["total_precipitation"].ops == ["sum"]
