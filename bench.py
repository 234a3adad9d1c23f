"""Benchmark driver entry — prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: training patches/sec/chip on the BASELINE configs[0] shape
(dilated_icpr_rate6, fixed 25x25 patches, batch 100 — Coffee-sized
synthetic raster since the real dataset is not on this machine;
BASELINE.md provenance caveat).

vs_baseline: the reference implementation is legacy TF-CPU and its
throughput was never published (BASELINE.md), so the baseline is a REAL
TF 2.x CPU trainer mirroring the reconstructed reference semantics
(scripts/tf_baseline.py: same architecture/loss/optimizer, host numpy
patch extraction, tf.function graph loop), measured ON THIS MACHINE
(11.19 patches/s, 1 vCPU, 2026-08-17). Cached in bench_baseline.json;
regenerated via tf_baseline.py when absent. Driver target is >=10x.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")

BENCH_SNIPPET = r"""
import json, time, sys, os
import jax
if os.environ.get("DYNSEG_BENCH_PLATFORM") == "cpu":
    # axon sitecustomize force-sets jax_platforms; override post-import
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from dynseg.cli import enable_compilation_cache
enable_compilation_cache()
import numpy as np
from dynseg.config import Config, DataConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.datasets import load_synthetic
from dynseg.train import Trainer

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 100
steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
spc = int(sys.argv[3]) if len(sys.argv) > 3 else 1
cfg = Config(
    model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=2,
                      num_input_bands=3),
    sched=SchedulerConfig(distribution_type="single_fixed", values=(25,)),
    train=TrainConfig(batch_size=batch, seed=0, steps_per_call=spc),
    data=DataConfig(dataset="synthetic"),
)
train_tiles, _ = load_synthetic(seed=0, num_tiles=4, size=256)
trainer = Trainer(cfg, train_tiles)
state = trainer.init_state(jax.random.key(0))
rng = jax.random.key(1)
# warmup / compile. NOTE: on the axon remote platform block_until_ready
# can return before the work is done — a real value fetch is the only
# honest sync (see docs/DESIGN.md "measurement rules").
for _ in range(3):
    rng, dr = jax.random.split(rng)
    state, m = trainer.train_step(state, 25, dr)
float(np.asarray(m["loss"]).sum())
t0 = time.perf_counter()
for _ in range(steps):
    rng, dr = jax.random.split(rng)
    state, m = trainer.train_step(state, 25, dr)
# fetch a value that depends on the LAST step's params so the whole
# step chain is forced, not just enqueued
float(np.asarray(jax.tree_util.tree_leaves(state.params)[0]).ravel()[0])
dt = time.perf_counter() - t0
print("RESULT", json.dumps({{"patches_per_sec": batch * steps * spc / dt,
                             "platform": jax.devices()[0].platform}}))
"""


def run_bench(env_extra, batch, steps, steps_per_call=1):
    env = dict(os.environ)
    env.update(env_extra)
    code = BENCH_SNIPPET.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(batch), str(steps), str(steps_per_call)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"bench subprocess failed:\n{out.stdout}\n{out.stderr}")


INFER_SNIPPET = r"""
import json, time, sys, os
import jax
if os.environ.get("DYNSEG_BENCH_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
import numpy as np
from dynseg.cli import enable_compilation_cache
enable_compilation_cache()
from dynseg.config import Config, DataConfig, InferConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.tiles import TileSet
from dynseg.infer import Inferencer
from dynseg.models.dilated import build_model
import jax.numpy as jnp

size = int(os.environ.get("DYNSEG_BENCH_INFER_SIZE", "1024"))
wm = float(os.environ.get("DYNSEG_BENCH_WIDTH", "1.0"))
scales = (25, 35, 45, 55, 65) if size >= 256 else (9, 13)
cfg = Config(
    model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6,
                      num_input_bands=3, width_multiplier=wm),
    sched=SchedulerConfig(values=scales),
    train=TrainConfig(batch_size=4),
    infer=InferConfig(scales=scales),
    data=DataConfig(dataset="synthetic"),
)
model = build_model(cfg.model)
variables = model.init(jax.random.key(0),
                       jnp.zeros((1, scales[0], scales[0], 3)), train=False)
img = np.random.default_rng(0).integers(0, 256, (size, size, 3)).astype(np.uint8)
tiles = TileSet(images=img[None].astype(np.float32),
                masks=np.zeros((1, size, size), np.int32),
                valid_hw=np.array([[size, size]], np.int32),
                mean=np.zeros(3, np.float32), std=np.ones(3, np.float32))
inf = Inferencer(cfg, tiles)
mpx = size * size / 1e6
out = {{}}

def timed_best(fn, reps=3):
    # Best-of-N: a single timed call over the tunneled remote chip can
    # absorb a multi-hundred-ms transport stall, inverting mode rankings
    # that repeated measurement (scripts/bench_quant.py) shows are stable.
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best

for mode, fn in [("window", lambda: inf.predict_tile(variables, 0, return_probs=False)),
                 ("dense", lambda: inf.predict_tile_dense(variables, 0, return_probs=False)),
                 ("dense512", lambda: inf.predict_tile_dense(variables, 0, block=512, return_probs=False))]:
    fn()  # warm/compile
    out[mode] = round(mpx / timed_best(fn), 3)
# int8 serving-path legs (best-effort: full-width models only — the
# narrow CPU model has no >=128-channel blocks to quantize)
if wm >= 1.0:
    try:
        import dataclasses
        qcfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(cfg.infer, quant="int8",
                                           quant_exit=True,
                                           quant_calib_crops=2))
        qinf = Inferencer(qcfg, tiles)
        qv = qinf.enable_quant(variables)
        for mode, fn in [("window_int8", lambda: qinf.predict_tile(qv, 0, return_probs=False)),
                         ("dense512_int8", lambda: qinf.predict_tile_dense(qv, 0, block=512, return_probs=False))]:
            fn()  # warm/compile
            out[mode] = round(mpx / timed_best(fn), 3)
    except Exception as e:
        out["int8_error"] = str(e)[:120]
print("RESULT", json.dumps(out))
"""


def run_infer_bench(env_extra=None):
    env = dict(os.environ)
    env.update(env_extra or {})
    try:
        out = subprocess.run(
            [sys.executable, "-c", INFER_SNIPPET.format(repo=REPO)],
            capture_output=True, text=True, env=env, timeout=1500,
        )
        for line in out.stdout.splitlines():
            if line.startswith("RESULT "):
                return json.loads(line[len("RESULT "):])
        print(f"infer bench produced no RESULT:\n{out.stderr[-2000:]}",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — best-effort leg, but say why
        print(f"infer bench skipped: {type(e).__name__}: {e}", file=sys.stderr)
    return None  # inference extras are best-effort; train metric stands


def main():
    # TF-CPU reference baseline (cached across rounds — scripts/
    # tf_baseline.py regenerates it; fall back to the XLA-CPU self-proxy
    # only if TF is unavailable).
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            baseline = json.load(f)
        if baseline.get("platform") != "tf-cpu":
            print(f"warning: cached baseline platform is "
                  f"{baseline.get('platform')!r}, not the TF-CPU reference "
                  f"measurement — vs_baseline is a proxy; rerun "
                  f"scripts/tf_baseline.py --write_cache", file=sys.stderr)
    else:
        try:
            # --write_cache makes tf_baseline.py persist its own result;
            # a TRANSIENT failure must NOT be cached (it would silently
            # replace the TF denominator with the proxy forever).
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "scripts", "tf_baseline.py"),
                 "--batch", "50", "--steps", "6", "--write_cache"],
                capture_output=True, text=True, timeout=1800,
            )
            baseline = json.loads(
                [l for l in out.stdout.splitlines() if l.startswith("{")][-1])
        except Exception as e:  # noqa: BLE001 — degraded but explicit
            print(f"tf_baseline failed ({e}); using UNCACHED XLA-CPU proxy",
                  file=sys.stderr)
            # Match the numerator's batch / launch-fusion (spc=16) so the
            # degraded ratio measures the PLATFORM, not batch-size +
            # dispatch-amortization differences (review r2; the proxy had
            # drifted to spc=4 when the numerator moved to 16). One fused
            # launch: 1 vCPU.
            baseline = run_bench({"DYNSEG_BENCH_PLATFORM": "cpu"},
                                 batch=100, steps=1, steps_per_call=16)
            baseline["platform"] = "xla-cpu-proxy"

    # TPU (or whatever the default platform is) measurement. 16 fused
    # steps/launch amortizes the remote-tunnel dispatch latency (the
    # scheduler then gets feedback once per chunk — a documented mode).
    # The tunneled chip has recurring multi-hour outages ("TPU backend
    # setup/compile error (Unavailable)"): fall back to a CPU
    # measurement with LOUD provenance rather than crashing with no
    # JSON line at all.
    result = None
    try:
        result = run_bench({}, batch=100, steps=8, steps_per_call=16)
    except Exception as e:  # noqa: BLE001 — backend-down path
        print(f"accelerator bench failed: {str(e)[:300]}", file=sys.stderr)
    accel_down = result is None
    if accel_down:
        # Small shapes here ON PURPOSE: this emergency value is already
        # stamped as degraded, and the numerator's batch-100 program
        # takes >30 min to COMPILE on this 1-vCPU host — completing with
        # a flagged number beats timing out with none.
        print("accelerator unavailable — measuring on CPU with provenance "
              "stamped (value is NOT per-chip TPU throughput)",
              file=sys.stderr)
        try:
            result = run_bench({"DYNSEG_BENCH_PLATFORM": "cpu"},
                               batch=16, steps=4)
            result["platform"] = "cpu"
        except Exception as e:  # noqa: BLE001 — even the emergency CPU
            # leg can time out on the contended 1-vCPU host; the module
            # contract is ONE JSON line no matter what (review r2, r2).
            print(f"emergency CPU bench also failed: {str(e)[:300]}",
                  file=sys.stderr)
            result = {"patches_per_sec": 0.0, "platform": "none",
                      "error": str(e)[:200]}
    value = result["patches_per_sec"]
    if result.get("platform") not in ("tpu", "axon"):
        # review r2: a silent JAX CPU fallback (dead tunnel) must never be
        # reported as per-chip TPU throughput without a loud flag.
        print(f"warning: numerator ran on {result.get('platform')!r} — "
              f"accelerator unavailable? value is NOT per-chip TPU "
              f"throughput", file=sys.stderr)
    vs = value / baseline["patches_per_sec"]
    # The BASELINE metric is composite ("train patches/sec/chip +
    # inference Mpx/s"); the primary value/vs_baseline stay the train
    # number, the inference rates ride along for the record. Skipped
    # when the accelerator leg already failed (it would hang its own
    # 1500 s against the same dead backend).
    infer = None if accel_down else run_infer_bench()
    line = {
        "metric": "train_patches_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "patches/s",
        "vs_baseline": round(vs, 2),
    }
    # Provenance rides in the JSON so a consumer can distinguish the real
    # TF-CPU denominator (and a real TPU numerator) from degraded modes.
    if baseline.get("platform") != "tf-cpu":
        line["baseline_platform"] = baseline.get("platform", "unknown")
    if result.get("platform") not in ("tpu", "axon"):
        line["numerator_platform"] = result.get("platform", "unknown")
    if "error" in result:
        line["error"] = result["error"]
    if infer:
        line["inference_mpx_per_s"] = infer  # {"window": ..., "dense": ...}
    print(json.dumps(line))


if __name__ == "__main__":
    main()
