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


def test_bench_main_chip_down_fallback(capsys):
    """Outage path: the accelerator leg raising must still emit ONE JSON
    line, stamped with numerator provenance, and must NOT attempt the
    inference leg against the same dead backend."""
    bench = _load_bench()
    calls = []

    def fake_run_bench(env_extra, batch, steps, steps_per_call=1):
        calls.append(env_extra)
        if env_extra.get("DYNSEG_BENCH_PLATFORM") != "cpu":
            raise RuntimeError("TPU backend setup/compile error (Unavailable)")
        return {"patches_per_sec": 7.0, "platform": "cpu"}

    bench.run_bench = fake_run_bench
    bench.run_infer_bench = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("infer leg must be skipped when the chip is down"))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    import json as _json
    line = _json.loads(out[-1])
    assert line["metric"] == "train_patches_per_sec_per_chip"
    assert line["numerator_platform"] == "cpu"
    assert line["value"] == 7.0
    assert "inference_mpx_per_s" not in line
    # first call was the accelerator attempt, second the CPU fallback
    assert len(calls) == 2 and calls[0] == {}


def test_infer_bench_smoke():
    bench = _load_bench()
    result = bench.run_infer_bench({
        "DYNSEG_BENCH_PLATFORM": "cpu",
        "DYNSEG_BENCH_INFER_SIZE": "48",
        "DYNSEG_BENCH_INFER_TILES": "2",
        "DYNSEG_BENCH_INFER_REPS": "2",
        "DYNSEG_BENCH_WIDTH": "0.125",
    })
    assert result and result["window"] > 0 and result["dense512"] > 0
    assert result["window_top2"] > 0
    # the recommended serving config (top-2 + bfloat16 activations) is a
    # first-class leg (r3; accuracy-free per docs/bf16_eval.json)
    assert result["window_top2_bf16"] > 0
    # measurement metadata rides along (ADVICE r2: raw times + reps)
    assert result["reps"] == 2
    assert len(result["raw_pass_s"]["window"]) == 2
    assert result["pass_mpx"] > 0


def test_bench_main_reports_strict_and_meta(capsys):
    """The JSON line carries BOTH train cadences (fused + strict spc=1)
    and the inference measurement metadata (verdict r2 #3 / weak #6)."""
    bench = _load_bench()
    calls = []

    def fake_run_bench(env_extra, batch, steps, steps_per_call=1):
        calls.append((steps_per_call,
                      env_extra.get("DYNSEG_BENCH_COMPUTE_DTYPE", "float32")))
        scale = 1.147 if "DYNSEG_BENCH_COMPUTE_DTYPE" in env_extra else 1.0
        return {"patches_per_sec": 100.0 * steps_per_call * scale,
                "platform": "tpu", "dispatch_ms": 27.5}

    bench.run_bench = fake_run_bench
    bench.run_infer_bench = lambda *a, **k: {
        "window": 1.0, "window_top2": 2.5, "dense512": 12.0,
        "raw_pass_s": {"window": [1.0]}, "pass_mpx": 8.4, "reps": 5,
        "dispatch_ms": 26.0}
    # MUST be mocked: the real trained leg launches a full training
    # subprocess on the default (chip) platform — a unit test may not
    # (r4 review: the unmocked leg silently trained 300 iters on chip).
    bench.run_trained_bench = lambda *a, **k: {
        "window_top2_trained_bf16": 4.0, "top2_scales": [65, 55],
        "trained_oa": 0.91, "raw_pass_s": [2.0]}
    bench.main()
    import json as _json
    line = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert line["value"] == 1600.0          # fused spc=16 stays primary
    assert line["train_strict_spc1"] == 100.0
    # r5: the bf16-compute option's rate rides along (fused cadence,
    # bfloat16 env knob) without touching the f32 primary value
    assert calls == [(16, "float32"), (1, "float32"), (16, "bfloat16")]
    assert line["train_bf16_patches_per_sec"] == round(1600.0 * 1.147, 2)
    assert line["inference_mpx_per_s"]["window_top2"] == 2.5
    assert line["inference_meta"]["reps"] == 5
    assert "raw_pass_s" in line["inference_meta"]
    # r4 (verdict r3 #3b/#4): tunnel-weather stamps + the trained-ckpt
    # leg's self-contained provenance must survive into the JSON line
    assert line["train_dispatch_ms"] == 27.5
    assert line["train_strict_dispatch_ms"] == 27.5
    assert line["inference_meta"]["dispatch_ms"] == 26.0
    assert line["trained_ckpt_leg"]["top2_scales"] == [65, 55]


def test_bench_main_total_failure_still_emits_json(capsys):
    """review r2 (round 2): if the emergency CPU leg ALSO fails (1-vCPU
    timeout), main() must still print one JSON line — value 0, platform
    'none', error recorded — never an uncaught traceback."""
    bench = _load_bench()

    def fake_run_bench(env_extra, batch, steps, steps_per_call=1):
        raise RuntimeError("everything is down")

    bench.run_bench = fake_run_bench
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    import json as _json
    line = _json.loads(out[-1])
    assert line["value"] == 0.0
    assert line["numerator_platform"] == "none"
    assert "error" in line
