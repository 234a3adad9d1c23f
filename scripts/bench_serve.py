"""Serving-path throughput: the exported StableHLO artifact driven by
ServingEngine (the HTTP server's engine, minus the socket) on a
production-sized raster. Complements scripts/profile_infer.py, which
measures the in-framework Inferencer.

Usage: python scripts/bench_serve.py [--size 1024] [--blocks 256,512]
           [--window] [--platform cpu]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--blocks", default="256,512")
    ap.add_argument("--window", action="store_true",
                    help="also time reference-parity window voting "
                         "(25..65 px scales; ~20x the dense compute)")
    ap.add_argument("--platform", default="")
    ap.add_argument("--quant", default="none", choices=["none", "int8"],
                    help="bench the mixed-int8 serving artifact "
                         "(ops/quant.py; calibrated on random crops)")
    args = ap.parse_args()

    import jax

    if args.platform:
        # safe: jax backends initialize lazily, so config.update before
        # any device use is honored (same pattern as parity_bracket)
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from dynseg.cli import enable_compilation_cache
    enable_compilation_cache()
    from dynseg.config import Config, DataConfig, InferConfig, ModelConfig, SchedulerConfig, TrainConfig
    from dynseg.export import ExportedPredictor, export_predictor
    from dynseg.models.dilated import build_model
    from dynseg.serve import ServingEngine

    import jax.numpy as jnp

    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6,
                          num_input_bands=3),
        sched=SchedulerConfig(values=(25, 35, 45, 55, 65)),
        train=TrainConfig(batch_size=4),
        infer=InferConfig(scales=(25, 35, 45, 55, 65), dense_halo=40),
        data=DataConfig(dataset="synthetic"),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 25, 25, 3), jnp.float32), train=False)
    img = (np.random.default_rng(0).uniform(0, 255,
           (args.size, args.size, 3)).astype(np.float32))

    quant_variables = None
    if args.quant == "int8":
        from dynseg.ops import quant as quant_ops

        crops = [jnp.asarray(img[:128, :128])]
        ranges = quant_ops.calibrate(cfg.model, variables, crops, 99.9)
        quant_variables = quant_ops.quantize_variables(
            cfg.model, variables, ranges, num_input_bands=3)
        print(f"int8 artifact: quantized "
              f"{sorted(quant_variables['quant'])}")

    with tempfile.TemporaryDirectory() as tmp:
        export_predictor(cfg, variables, np.zeros(3, np.float32),
                         np.ones(3, np.float32), tmp,
                         quant_variables=quant_variables)
        eng = ServingEngine(ExportedPredictor.load(tmp), window_batch=128)
        mpx = args.size * args.size / 1e6

        img8 = img.astype(np.uint8)
        for block in (int(b) for b in args.blocks.split(",")):
            eng.dense(img, block=block)  # warm (compile)
            t0 = time.perf_counter()
            eng.dense(img, block=block)
            dt = time.perf_counter() - t0
            print(f"dense  f32 probs  block={block:4d}: {dt:6.2f}s  "
                  f"{mpx / dt:6.2f} Mpx/s")
            eng.dense(img8, block=block)  # warm u8 entry
            t0 = time.perf_counter()
            eng.dense(img8, block=block)
            dt = time.perf_counter() - t0
            print(f"dense  u8  probs  block={block:4d}: {dt:6.2f}s  "
                  f"{mpx / dt:6.2f} Mpx/s")
            eng.dense_labels(img8, block=block)  # warm labels entry
            t0 = time.perf_counter()
            eng.dense_labels(img8, block=block)
            dt = time.perf_counter() - t0
            print(f"dense  u8  labels block={block:4d}: {dt:6.2f}s  "
                  f"{mpx / dt:6.2f} Mpx/s")

        if args.window:
            eng.window(img[:256, :256])  # warm all (scale, batch) programs
            t0 = time.perf_counter()
            eng.window(img)
            dt = time.perf_counter() - t0
            print(f"window 5-scale:   {dt:6.2f}s  {mpx / dt:6.2f} Mpx/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
