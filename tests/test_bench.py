"""bench.py is the driver's round metric — if it breaks, the round
records nothing. Smoke the subprocess harness end to end on CPU."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_harness_smoke():
    bench = _load_bench()
    result = bench.run_bench(
        {"DYNSEG_BENCH_PLATFORM": "cpu"}, batch=2, steps=2, steps_per_call=1)
    assert result["platform"] == "cpu"
    assert result["patches_per_sec"] > 0


def test_infer_bench_smoke():
    bench = _load_bench()
    result = bench.run_infer_bench({
        "DYNSEG_BENCH_PLATFORM": "cpu",
        "DYNSEG_BENCH_INFER_SIZE": "48",
        "DYNSEG_BENCH_WIDTH": "0.125",
    })
    assert result and result["window"] > 0 and result["dense"] > 0
