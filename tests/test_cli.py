"""CLI subcommands driven in-process (the session-owning surface)."""

from __future__ import annotations

import io

import pytest

from geoglue_ray.cli import main


def test_zonalstats_then_stats(tmp_path, capsys):
    out = tmp_path / "zs"
    rc = main(
        [
            "zonalstats",
            "--sf-dir",
            "/root/testdata/sf0.001",
            "--ops",
            "mean,sum,count",
            "--output",
            str(out),
        ]
    )
    assert rc == 0
    assert str(out) in capsys.readouterr().out
    assert list(out.glob("*.parquet"))
    rc = main(["stats", "--input", str(out)])
    assert rc == 0


def test_crop_and_merge(tmp_path, capsys):
    a = tmp_path / "a"
    b = tmp_path / "b"
    for dest, bbox in [(a, "104,10,106,14"), (b, "102,8,104,10")]:
        rc = main(
            [
                "crop",
                "--sf-dir",
                "/root/testdata/sf0.001",
                "--bbox",
                bbox,
                "--output",
                str(dest),
                "--no-spans",
            ]
        )
        assert rc == 0
    capsys.readouterr()
    merged = tmp_path / "m"
    listing = io.StringIO(f"{a}\n{b}\n")
    # drive merge via the --file handle (stdin stand-in)
    import geoglue_ray.cli as cli

    class Args:
        output = str(merged)
        file = listing

    assert cli.cmd_merge(Args()) == 0
    import ray.data as rd

    n = rd.read_parquet(str(merged)).count()
    na = rd.read_parquet(str(a)).count()
    nb = rd.read_parquet(str(b)).count()
    assert n == na + nb


def test_resample_unknown_method_errors():
    with pytest.raises(SystemExit):
        main(["resample", "--method", "remapcon", "--output", "/tmp/x"])


def test_merge_empty_stdin_errors(tmp_path):
    import geoglue_ray.cli as cli

    class Args:
        output = str(tmp_path / "m")
        file = io.StringIO("")

    assert cli.cmd_merge(Args()) == 1
