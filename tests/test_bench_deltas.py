"""bench.py's regression guard must watch the extract protocol times.

Round-4 post-mortem: the extract docs/sec halved in the driver's bench
artifact and `_deltas` said nothing because it iterated only the query
timings dict — the guard was blind to the project's headline metric.
These tests pin the round-5 fix with a fabricated previous-round file
(no Spark involved).
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys


def _load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(repo, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_deltas_flags_extract_regression(tmp_path, monkeypatch):
    bench = _load_bench()
    prev = {
        "queries": {"q1": 1.0},
        "extract": {"sec": 10.0, "pipeline_sec": 20.0},
    }
    # point the previous-round loader at a fabricated artifact
    monkeypatch.setattr(
        bench, "_prev_round", lambda: ("BENCH_rTEST.json", prev)
    )
    out = bench._deltas(
        {"q1": 1.1}, extract={"sec": 21.0, "pipeline_sec": 19.0}
    )
    assert "extract.sec" in out["regressions"]
    assert out["regressions"]["extract.sec"]["ratio"] == 2.1
    assert "q1" not in out["regressions"]  # 1.1x is under threshold
    assert "extract.pipeline_sec" not in out["regressions"]


def test_deltas_flags_extract_improvement_and_handles_absence(monkeypatch):
    bench = _load_bench()
    prev = {"queries": {"q1": 1.0}}  # old artifact without extract block
    monkeypatch.setattr(
        bench, "_prev_round", lambda: ("BENCH_rTEST.json", prev)
    )
    # no extract in the previous round -> no extract rows, no crash
    out = bench._deltas({"q1": 0.5}, extract={"sec": 5.0})
    assert "q1" in out["improvements"]
    assert not any(k.startswith("extract.") for k in out["regressions"])
    prev2 = {
        "queries": {},
        "extract": {"sec": 10.0, "pipeline_sec": 20.0},
    }
    monkeypatch.setattr(
        bench, "_prev_round", lambda: ("BENCH_rTEST.json", prev2)
    )
    out2 = bench._deltas({}, extract={"sec": 6.0, "pipeline_sec": 9.0})
    assert out2["improvements"]["extract.sec"]["ratio"] == 0.6
    assert out2["improvements"]["extract.pipeline_sec"]["ratio"] == 0.45
