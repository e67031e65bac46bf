from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from geoglue_ray.functions.logfmt import parse_logfmt
from geoglue_ray.stages.counters import emit_logfmt, instrument, read_counters


def test_instrument_counts_rows():
    read_counters(reset=True)
    t = pa.table({"x": list(range(1000))})
    ds = instrument(rd.from_arrow(t), "in")
    ds = ds.map_batches(
        lambda b: b.filter(pa.compute.less(b["x"], 250)), batch_format="pyarrow"
    )
    ds = instrument(ds, "out")
    assert ds.count() == 250
    # increments are fire-and-forget: wait for the actor mailbox to drain
    import time

    snap = {}
    for _ in range(50):
        snap = read_counters()
        if snap.get("in", {}).get("rows") == 1000 and snap.get("out", {}).get("rows") == 250:
            break
        time.sleep(0.1)
    read_counters(reset=True)
    assert snap["in"]["rows"] == 1000
    assert snap["out"]["rows"] == 250
    assert snap["in"]["bytes"] > 0 and snap["in"]["batches"] >= 1
    lines = emit_logfmt(snap)
    parsed = {parse_logfmt(ln)["stage"]: parse_logfmt(ln) for ln in lines}
    assert parsed["in"]["rows"] == "1000"
