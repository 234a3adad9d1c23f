"""Real TF-CPU reference baseline for the >=10x throughput target
(round-1 verdict Missing #4 / "Next round" #6).

BASELINE.json's throughput target is ">=10x patches/sec vs the TF-CPU
reference"; round 1 proxied the baseline with the repo's OWN XLA-CPU
path, which is not a TF measurement. This script is a minimal TF 2.x
trainer faithfully mirroring the reconstructed reference semantics for
BASELINE configs[0] (Coffee-style fixed 25x25 patches,
dilated_icpr_rate6 — SURVEY.md C6/C11/C13):

  * identical architecture table (models/dilated.py _ARCH): kernels
    5,5,4,4,3,3 / channels 64,64,128,128,256,256 / dilations 1..6,
    conv(SAME, stride1) -> BN -> leaky-ReLU(0.1) -> 3x3 stride-1 SAME
    max-pool, 1x1-conv head
  * per-pixel sparse softmax cross-entropy averaged over all pixels +
    kernel-only L2 weight decay ([R] dynamic.py:≈loss construction)
  * momentum-SGD (lr 0.01, momentum 0.9)
  * HOST-side numpy balanced patch extraction + dihedral augmentation
    per batch — the reference's data path ([R] dynamic.py:≈
    dynamically_create_patches), via the same sampler the JAX framework
    uses for position tables
  * graph execution via tf.function (TF2's equivalent of the reference's
    tf.Session run loop — if anything a FLATTERING stand-in for TF1)

Prints ONE JSON line {"patches_per_sec": N, "platform": "tf-cpu", ...};
--write_cache updates bench_baseline.json so bench.py's vs_baseline
compares against a genuine TF measurement on this machine.

Usage:
    python scripts/tf_baseline.py [--batch 100] [--steps 20] [--write_cache]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_tf_model(tf, num_classes: int, bands: int, width: float = 1.0,
                   kernel_init: str = "glorot_uniform"):
    """dilated_icpr_rate6 in Keras ops — mirrors dynseg/models/dilated.py
    _ARCH + blocks.DilatedConvBlock exactly (BN, leaky 0.1, stride-1
    pools, no bias under BN). `width` scales the channel table the same
    way ModelConfig.width_multiplier does (CPU pilots). `kernel_init`:
    Keras's default is glorot_uniform; pass 'lecun_normal' to match the
    flax Conv default the JAX framework uses — the initializer family is
    a documented reconstruction bracket (SURVEY §3), and the protocol-
    parity harness uses this knob to attribute accuracy gaps to it."""
    L = tf.keras.layers
    arch = [(5, 64, 1), (5, 64, 2), (4, 128, 3),
            (4, 128, 4), (3, 256, 5), (3, 256, 6)]
    inp = tf.keras.Input(shape=(None, None, bands))
    x = inp
    for k, f, d in arch:
        f = max(1, int(f * width))  # same trunc rule as ModelConfig
        x = L.Conv2D(f, k, padding="same", dilation_rate=d, use_bias=False,
                     kernel_initializer=kernel_init)(x)
        x = L.BatchNormalization(momentum=0.9, epsilon=1e-5)(x)
        try:
            x = L.LeakyReLU(negative_slope=0.1)(x)   # Keras 3
        except TypeError:
            x = L.LeakyReLU(alpha=0.1)(x)            # Keras 2
        x = L.MaxPool2D(pool_size=3, strides=1, padding="same")(x)
    out = L.Conv2D(num_classes, 1, padding="same")(x)
    return tf.keras.Model(inp, out)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--patch", type=int, default=25)
    ap.add_argument("--learning_rate", type=float, default=0.01)
    ap.add_argument("--weight_decay", type=float, default=5e-4)
    ap.add_argument("--write_cache", action="store_true",
                    help="store the measurement in bench_baseline.json "
                         "(bench.py's vs_baseline denominator)")
    args = ap.parse_args()

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")  # CPU reference

    from dynseg.data.datasets import load_synthetic
    from dynseg.data.sampler import BalancedPatchSampler
    from dynseg.data.tiles import mirror_pad
    from dynseg.ops.dihedral import dihedral

    # Same synthetic raster set as bench.py's train metric (coffee-sized
    # stand-in; the real dataset is not on this machine — BASELINE.md).
    train_tiles, _ = load_synthetic(seed=0, num_tiles=4, size=256)
    pad = args.patch // 2 + 1
    padded = mirror_pad(train_tiles, pad)
    sampler = BalancedPatchSampler(padded, num_classes=2, pad=pad, seed=0)
    rng = np.random.default_rng(0)
    mean, std = train_tiles.mean, train_tiles.std

    def host_batch(n: int, size: int):
        """Reference-style host extraction: balanced positions -> numpy
        crop -> normalize -> random dihedral, per batch."""
        pos = sampler.sample(n)  # (n, 3): tile, row, col in padded coords
        half = size // 2
        xs = np.empty((n, size, size, padded.images.shape[-1]), np.float32)
        ys = np.empty((n, size, size), np.int32)
        for i, (t, r, c) in enumerate(pos):
            r0, c0 = r - half, c - half
            img = padded.images[t, r0:r0 + size, c0:c0 + size]
            lab = padded.masks[t, r0:r0 + size, c0:c0 + size]
            k = int(rng.integers(0, 8))
            xs[i] = dihedral((img - mean) / std, k, np)
            ys[i] = dihedral(lab[..., None], k, np)[..., 0]
        return xs, ys

    model = build_tf_model(tf, num_classes=2, bands=3)
    opt = tf.keras.optimizers.SGD(learning_rate=args.learning_rate,
                                  momentum=0.9)
    # Conv kernels only (rank-4), mirroring the JAX path's kernel-only
    # weight decay (train.py C11). Keras-3 variable names are bare
    # "kernel"/"gamma"/"beta" — filter by rank, not layer name.
    # Rank-4 alone selects exactly the conv kernels on BOTH Keras 2
    # ("conv2d/kernel:0") and Keras 3 ("kernel") naming (review r2: the
    # name suffix check broke Keras 2 and silently degraded bench.py to
    # its proxy denominator).
    kernels = [v for v in model.trainable_variables if len(v.shape) == 4]

    @tf.function
    def train_step(x, y):
        with tf.GradientTape() as tape:
            logits = model(x, training=True)
            # Masked per-pixel CE (IGNORE=255 from mirror-pad margins),
            # mirroring dynseg.train.masked_cross_entropy.
            valid = tf.not_equal(y, 255)
            y_safe = tf.where(valid, y, tf.zeros_like(y))
            ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
                labels=y_safe, logits=logits)
            ce = tf.where(valid, ce, tf.zeros_like(ce))
            ce = (tf.reduce_sum(ce)
                  / tf.maximum(tf.reduce_sum(tf.cast(valid, tf.float32)), 1.0))
            l2 = tf.add_n([tf.nn.l2_loss(k) for k in kernels])
            loss = ce + args.weight_decay * l2
        grads = tape.gradient(loss, model.trainable_variables)
        opt.apply_gradients(zip(grads, model.trainable_variables))
        return loss

    for _ in range(args.warmup):
        x, y = host_batch(args.batch, args.patch)
        train_step(tf.constant(x), tf.constant(y))

    t0 = time.perf_counter()
    last = None
    for _ in range(args.steps):
        x, y = host_batch(args.batch, args.patch)
        last = train_step(tf.constant(x), tf.constant(y))
    loss = float(last.numpy())  # forces the final step
    dt = time.perf_counter() - t0

    result = {
        "patches_per_sec": round(args.batch * args.steps / dt, 3),
        "platform": "tf-cpu",
        "tf_version": tf.__version__,
        "batch": args.batch,
        "steps": args.steps,
        "final_loss": round(loss, 4),
        "cpu_count": os.cpu_count(),
    }
    print(json.dumps(result))
    if args.write_cache:
        with open(os.path.join(REPO, "bench_baseline.json"), "w") as f:
            json.dump(result, f)
        print(f"-> wrote bench_baseline.json", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
