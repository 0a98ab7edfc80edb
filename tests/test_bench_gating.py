"""The bench JSON's ok field must be gated on the measurement tier's
advertised grade (round-3 verdict item 3: a broken df32 tier published
ok:true with a 4.9e+5 self-check; a JSON consumer could not tell)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_measured_ok_gates_on_tier_grade():
    bench = _load_bench()
    # the round-3 failure signature goes ok:false now
    assert bench.measured_ok("df32", 4.9e5) is False
    assert bench.measured_ok("df32", 1.3e-5) is False   # above 1e-6 too
    assert bench.measured_ok("df32", 1.2e-8) is True
    # tf32's contract is the <1e-10 north star
    assert bench.measured_ok("tf32", 1.9e-12) is True
    assert bench.measured_ok("tf32", 1.1e-10) is False
    assert bench.measured_ok("tf32", 1.08e-1) is False
    # engine tier: envelope sanity bound only
    assert bench.measured_ok("engine", 11.0) is True
    assert bench.measured_ok("engine", 2.5e5) is False
