#!/usr/bin/env python
"""K3 closure probe: measure the overlap-add accumulator's ACTUAL share
of window-voting wall time on the real chip.

DESIGN.md K3 keeps the jnp fori_loop-of-dynamic_update_slice
accumulator on an Amdahl ESTIMATE (~30 KB of HBM RMW per window, two
orders below the window forward).  This probe replaces the estimate
with a measurement: it times the exact `Inferencer._accumulate_impl`
launch structure (outer lax.scan of K window batches, batched forward,
sequential ordered RMW — dynseg/infer.py:216) against a variant with
the accumulate REMOVED (probs reduced into a tiny carried sum so the
forward + softmax stay alive), and a third variant with the FORWARD
removed (probs fabricated from the gathered windows, accumulate kept).

    accumulate cost  =  t(full) - t(fwd_only)
    fraction         =  accumulate / t(full)

If the fraction is at or below run-to-run noise, a Pallas overlap-add
kernel has NO end-to-end headroom and K3 is closed by measurement, the
same evidentiary standard as K4/K5.  Methodology per DESIGN.md K5:
scalar-fetch syncs (block_until_ready is unreliable on the axon
tunnel), median of reps, raw times in the JSON.

Usage:  python scripts/k3_overlap_probe.py [--out docs/k3_overlap_probe.json]
        [--size 2048] [--reps 5] [--platform cpu]   # cpu = logic smoke
"""
from __future__ import annotations

import argparse
import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/k3_overlap_probe.json")
    ap.add_argument("--size", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--scales", default="25,65")
    ap.add_argument("--platform", default=None,
                    help="'cpu' forces the CPU backend (logic smoke)")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import jax.numpy as jnp
    import numpy as np

    from dynseg.cli import enable_compilation_cache
    from dynseg.config import (Config, DataConfig, InferConfig, ModelConfig,
                               SchedulerConfig, TrainConfig)
    from dynseg.infer import window_origins
    from dynseg.models.dilated import build_model

    enable_compilation_cache()

    scales = tuple(int(s) for s in args.scales.split(","))
    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6,
                          num_input_bands=3),
        sched=SchedulerConfig(values=(25, 35, 45, 55, 65)),
        train=TrainConfig(batch_size=4),
        infer=InferConfig(scales=(25, 35, 45, 55, 65)),
        data=DataConfig(dataset="synthetic"),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 25, 25, 3)), train=False)
    nc = cfg.model.num_classes
    B = cfg.infer.window_batch          # 256, the production window batch
    K = cfg.infer.scan_chunk            # 8 scan steps per launch
    pad = max(cfg.infer.scales) // 2
    size = args.size

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (size, size, 3)).astype(np.float32)
    tile = jnp.asarray(np.pad(
        img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect"))
    Hp, Wp = tile.shape[:2]
    mean = jnp.zeros(3, jnp.float32)
    std = jnp.ones(3, jnp.float32)

    def make_fn(variant: str, s: int):
        """The _accumulate_impl structure (dynseg/infer.py:216) with the
        accumulate or the forward removed.  `acc` is a tiny (nc,) carry
        that keeps the forward's output alive in fwd_only."""

        def impl(variables, tile, prob, cnt, acc, origins, weights):
            tile_f = tile.astype(jnp.float32)
            c = tile_f.shape[-1]

            def gather(o):
                w = jax.lax.dynamic_slice(tile_f, (o[0], o[1], 0), (s, s, c))
                return (w - mean) / std

            def batch_body(carry, xs):
                prob, cnt, acc = carry
                origins_b, weights_b = xs
                windows = jax.vmap(gather)(origins_b)
                if variant == "acc_only":
                    # Fabricate probs from the gathered windows (keeps
                    # the gather; drops the network forward).
                    probs = jnp.broadcast_to(
                        jnp.mean(windows, axis=-1, keepdims=True),
                        windows.shape[:3] + (nc,),
                    ) * weights_b[:, None, None, None]
                else:
                    logits = model.apply(variables, windows, train=False)
                    probs = jax.nn.softmax(logits.astype(jnp.float32), -1)
                    probs = probs * weights_b[:, None, None, None]

                if variant == "fwd_only":
                    acc = acc + jnp.sum(probs, axis=(0, 1, 2))
                else:
                    def body(i, carry):
                        p, n = carry
                        o = origins_b[i]
                        cur = jax.lax.dynamic_slice(
                            p, (o[0], o[1], 0), (s, s, nc))
                        p = jax.lax.dynamic_update_slice(
                            p, cur + probs[i], (o[0], o[1], 0))
                        curn = jax.lax.dynamic_slice(
                            n, (o[0], o[1], 0), (s, s, 1))
                        n = jax.lax.dynamic_update_slice(
                            n, curn + weights_b[i], (o[0], o[1], 0))
                        return p, n

                    prob, cnt = jax.lax.fori_loop(
                        0, origins_b.shape[0], body, (prob, cnt))
                return (prob, cnt, acc), None

            (prob, cnt, acc), _ = jax.lax.scan(
                batch_body, (prob, cnt, acc), (origins, weights))
            return prob, cnt, acc

        return jax.jit(impl, donate_argnames=("prob", "cnt", "acc"))

    def run(variant: str, s: int, reps: int):
        stride = max(1, int(round(s * cfg.infer.stride_fraction)))
        rows = window_origins(pad, pad + size, s, stride, Hp - s)
        cols = window_origins(pad, pad + size, s, stride, Wp - s)
        origins = np.array([(r, c) for r in rows for c in cols], np.int32)
        n = len(origins)
        n_pad = (-n) % B
        if n_pad:
            origins = np.concatenate(
                [origins, np.zeros((n_pad, 2), np.int32)])
        weights = np.concatenate(
            [np.ones(n, np.float32), np.zeros(n_pad, np.float32)])
        nb = len(origins) // B
        origins = origins.reshape(nb, B, 2)
        weights = weights.reshape(nb, B)
        bulk = (nb // K) * K
        fn = make_fn(variant, s)

        def one_pass():
            prob = jnp.zeros((Hp, Wp, nc), jnp.float32)
            cnt = jnp.zeros((Hp, Wp, 1), jnp.float32)
            acc = jnp.zeros((nc,), jnp.float32)
            for lo in range(0, bulk, K):
                prob, cnt, acc = fn(
                    variables, tile, prob, cnt, acc,
                    jnp.asarray(origins[lo:lo + K]),
                    jnp.asarray(weights[lo:lo + K]))
            for j in range(bulk, nb):
                prob, cnt, acc = fn(
                    variables, tile, prob, cnt, acc,
                    jnp.asarray(origins[j:j + 1]),
                    jnp.asarray(weights[j:j + 1]))
            # Scalar fetch = the only sync the axon tunnel can't lie
            # about (DESIGN.md K5 methodology).
            return float(np.asarray(prob[pad, pad, 0])), prob, cnt

        one_pass()  # warm: trace + compile both programs
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            one_pass()
            times.append(time.perf_counter() - t0)
        return {
            "median_s": round(statistics.median(times), 4),
            "raw_s": [round(t, 4) for t in times],
            "windows": int(n),
            "launches": nb // K + (nb - bulk) if bulk else nb,
        }

    result = {
        "date": time.strftime("%Y-%m-%d"),
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "size": size,
        "window_batch": B,
        "scan_chunk": K,
        "scales": {},
    }
    for s in scales:
        cell = {}
        for variant in ("full", "fwd_only", "acc_only"):
            cell[variant] = run(variant, s, args.reps)
            print(f"scale {s} {variant}: {cell[variant]['median_s']} s "
                  f"(raw {cell[variant]['raw_s']})", flush=True)
        full = cell["full"]["median_s"]
        fwd = cell["fwd_only"]["median_s"]
        cell["accumulate_s"] = round(full - fwd, 4)
        cell["accumulate_fraction"] = round((full - fwd) / full, 4)
        noise = max(cell["full"]["raw_s"]) - min(cell["full"]["raw_s"])
        cell["full_rep_spread_s"] = round(noise, 4)
        result["scales"][s] = cell
        print(f"scale {s}: accumulate {cell['accumulate_s']} s = "
              f"{100 * cell['accumulate_fraction']:.1f}% of full "
              f"(rep spread {noise:.4f} s)", flush=True)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(result, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
