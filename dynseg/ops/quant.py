"""Post-training int8 quantization for the inference path (serving).

Why: measured on v5e (docs/bench_dtype_conv.log, 2026-08-18), XLA lowers
`conv_general_dilated` on int8 operands to the MXU's int8 path — ~2x the
bf16 peak — but only once BOTH channel dims are >=128; below that the
repack overhead makes int8 *slower*. At our dense 512-block shapes the
deep layers win 1.53-1.71x and are 72% of conv time, so the design is
MIXED precision: quantize only blocks with min(cin, cout) >= quant_min_ch
(default 128), keep the shallow stem and the 1x1 head in float.

Scheme (standard PTQ, no training changes, reference has no analog —
this is beyond-reference serving surface):
  * weights: per-output-channel symmetric int8, scale = absmax_c / 127,
    quantized once at load time (`quantize_variables`);
  * activations: per-tensor symmetric int8, scale calibrated as a high
    percentile of |input| over sample crops (`calibrate`) — leaky-ReLU
    outputs are long-tailed, absmax alone wastes resolution;
  * conv accumulates in int32 (preferred_element_type), dequantizes with
    sx*sw_c, then bias/BN/leaky-ReLU/pool run in the float compute dtype
    exactly as the float path — XLA fuses the dequant chain into the
    conv epilogue, and int8 activations/weights also halve HBM traffic.

The forward here is a standalone functional mirror of
models/blocks.DilatedConvBlock + models/dilated.{DilatedNet,
DilatedDenseNet} (inference semantics: running BN stats, no dropout),
consuming the SAME checkpoint pytree naming (DilatedConvBlock_i/Conv_0,
BatchNorm_0, ScoreHead_0). Parity is pinned by tests
(tests/test_quant.py): with no 'quant' collection present it must match
model.apply(train=False) to float tolerance for all five net_types.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dynseg.config import ModelConfig
from dynseg.models.dilated import _ARCH


def _arch(mcfg: ModelConfig) -> Tuple[Tuple[int, int, int, bool], ...]:
    key = ("dilated_icpr_rate6"
           if mcfg.net_type == "dilated_icpr_rate6_densely" else
           mcfg.net_type)
    return _ARCH[key]


def _dense_wired(mcfg: ModelConfig) -> bool:
    return mcfg.net_type == "dilated_icpr_rate6_densely"


def block_specs(mcfg: ModelConfig, num_input_bands: int) -> List[dict]:
    """Per conv block: name, kernel, cin, cout, dilation, pool — with the
    width multiplier and dense-concat wiring applied, so channel-based
    quantization planning sees the REAL operand shapes."""
    specs = []
    cin = num_input_bands
    dense = _dense_wired(mcfg)
    total = num_input_bands  # dense wiring: input + all previous outputs
    for i, (k, feats, dil, pool) in enumerate(_arch(mcfg)):
        cout = max(1, int(feats * mcfg.width_multiplier))
        specs.append({
            "name": f"DilatedConvBlock_{i}", "kernel": k, "cin": cin,
            "cout": cout, "dilation": dil, "pool": pool,
        })
        if dense:
            total += cout
            cin = total
        else:
            cin = cout
    return specs


def quant_plan(mcfg: ModelConfig, num_input_bands: int,
               min_ch: int = 128) -> List[bool]:
    """True per block iff int8 is a measured win there: both channel dims
    at or above min_ch (docs/DESIGN.md int8 probe — 64->128 LOSES,
    128->128 wins 1.57-2.5x)."""
    return [min(s["cin"], s["cout"]) >= min_ch
            for s in block_specs(mcfg, num_input_bands)]


# --------------------------------------------------------------------- #
# Functional inference forward (float or mixed int8), checkpoint-tree
# compatible. Mirrors blocks.py:39-83 and dilated.py:69-116 inference
# semantics.
# --------------------------------------------------------------------- #


def _conv(x, w, dilation, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def _quantize_act(x, sx):
    return jnp.round(
        jnp.clip(x.astype(jnp.float32) / sx, -127.0, 127.0)
    ).astype(jnp.int8)


def _use_pallas_conv(mcfg: ModelConfig, spec: dict, x) -> bool:
    """Route this quantized block's conv through the K5 Pallas kernel?
    quant_conv: 'xla' (DEFAULT — measured fastest in the full net) =
    never; 'pallas' = whenever the geometry gate passes (interpret-mode
    on CPU — tests only); 'auto' = geometry gate AND the real TPU.
    auto/pallas are the K5 experiment's record (DESIGN.md K5)."""
    mode = getattr(mcfg, "quant_conv", "auto")
    if mode == "xla":
        return False
    hw_w = x.shape[2]
    if not isinstance(hw_w, int):
        # Symbolic dim (jax.export's shape-polymorphic, multi-platform
        # tracing): a Mosaic custom call is neither shape-polymorphic
        # nor CPU-lowerable, so exports always take the XLA emitter.
        # Serving still gets the kernel win by running --quant int8
        # through the CLI/Inferencer instead of the exported artifact.
        return False
    from dynseg.ops import pallas_conv

    if not pallas_conv.supported(hw_w, spec["cin"], spec["cout"],
                                 spec["kernel"], spec["dilation"]):
        return False
    return mode == "pallas" or jax.devices()[0].platform == "tpu"


def _block_forward(mcfg: ModelConfig, spec: dict, params, stats, quant,
                   x, record: Optional[dict], calib_pct: float,
                   in_scale=None, out_scale=None):
    """One conv block. `quant` is the block's quant-collection entry (int8
    path) or None (float path, parity with DilatedConvBlock).

    int8 streaming (the measured composition win — docs/DESIGN.md int8
    probe, "fused" chain 1.64x vs 0.91x naive): when `in_scale` is set,
    `x` is ALREADY int8 at that scale (the previous block requantized in
    its epilogue), so the standalone quantize pass disappears; when
    `out_scale` is set (the next block is quantized), this block's
    epilogue requantizes BEFORE the pool and the stride-1 max-pool runs
    on int8 — bit-identical results (max commutes with the monotonic
    quantize) at 1/4 the pool HBM traffic. Returns (y, carried_scale)
    where carried_scale is out_scale iff y is int8."""
    dtype = jnp.dtype(mcfg.compute_dtype)
    if in_scale is None:
        x = x.astype(dtype)
    if record is not None:
        # Calibration probe: the candidate activation scale for THIS
        # block's input, as a high percentile of |x| (float path only).
        record[spec["name"]] = jnp.percentile(
            jnp.abs(x.astype(jnp.float32)), calib_pct)
    conv_p = params["Conv_0"]
    if quant is None:
        if in_scale is not None:
            x = (x.astype(jnp.float32) * in_scale).astype(dtype)
        y = _conv(x, conv_p["kernel"].astype(dtype), spec["dilation"], dtype)
    else:
        sx = in_scale if in_scale is not None else quant["act_scale"]
        sw = quant["w_scale"]  # f32 (cout,)
        xq = x if in_scale is not None else _quantize_act(x, sx)
        if _use_pallas_conv(mcfg, spec, xq):
            # K5 (ops/pallas_conv.py), NON-DEFAULT experimental route:
            # the shifted-matmul kernel with the whole epilogue fused
            # in-launch. Beats the conv-ONLY emitter 1.41x but ties the
            # shipped fused-emitter per-block and loses 1.7x in-net
            # (custom calls break XLA's surrounding fusion) — kept
            # behind --quant_conv auto/pallas as the experiment's
            # record (DESIGN.md K5).
            from dynseg.ops import pallas_conv

            a = (sx * sw).astype(jnp.float32)
            if mcfg.use_batch_norm:
                bn, st = params["BatchNorm_0"], stats["BatchNorm_0"]
                inv = jax.lax.rsqrt(st["var"].astype(jnp.float32) + 1e-5)
                g = inv * bn["scale"].astype(jnp.float32)
                b = (bn["bias"].astype(jnp.float32)
                     - st["mean"].astype(jnp.float32) * g)
                a, b = a * g, b
            else:
                b = conv_p["bias"].astype(jnp.float32)
            y = pallas_conv.int8_block_conv(
                xq, conv_p["kernel"], a, b, dilation=spec["dilation"],
                leaky_slope=mcfg.leaky_slope, out_scale=out_scale,
                out_dtype=dtype,
                interpret=jax.devices()[0].platform != "tpu")
            if out_scale is not None:
                if spec["pool"]:
                    y = jax.lax.reduce_window(
                        y, jnp.int8(-128), jax.lax.max,
                        (1, mcfg.pool_window, mcfg.pool_window, 1),
                        (1, 1, 1, 1), "SAME")
                return y, out_scale
            if spec["pool"]:
                y = nn.max_pool(
                    y, window_shape=(mcfg.pool_window, mcfg.pool_window),
                    strides=(1, 1), padding="SAME")
            return y, None
        acc = _conv(xq, conv_p["kernel"], spec["dilation"], jnp.int32)
        y = (acc.astype(jnp.float32) * (sx * sw)).astype(dtype)
    if mcfg.use_batch_norm:
        bn, st = params["BatchNorm_0"], stats["BatchNorm_0"]
        inv = jax.lax.rsqrt(st["var"].astype(dtype) + jnp.asarray(1e-5, dtype))
        y = (y - st["mean"].astype(dtype)) * inv * bn["scale"].astype(dtype) \
            + bn["bias"].astype(dtype)
    else:
        y = y + conv_p["bias"].astype(dtype)
    y = nn.leaky_relu(y, negative_slope=mcfg.leaky_slope)
    if out_scale is not None:
        # Requantize in the epilogue (fuses with the dequant/BN/leaky
        # chain above into the conv's output fusion) and pool on int8.
        y = _quantize_act(y, out_scale)
        if spec["pool"]:
            y = jax.lax.reduce_window(
                y, jnp.int8(-128), jax.lax.max,
                (1, mcfg.pool_window, mcfg.pool_window, 1),
                (1, 1, 1, 1), "SAME")
        return y, out_scale
    if spec["pool"]:
        y = nn.max_pool(y, window_shape=(mcfg.pool_window, mcfg.pool_window),
                        strides=(1, 1), padding="SAME")
    return y, None


def _forward(mcfg: ModelConfig, variables, x, record: Optional[dict] = None,
             calib_pct: float = 99.9):
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    quant = variables.get("quant", {})
    dtype = jnp.dtype(mcfg.compute_dtype)
    specs = block_specs(mcfg, x.shape[-1])
    if _dense_wired(mcfg):
        # Dense (concat) wiring mixes every earlier feature map into each
        # input, so there is no single-stream int8 carry; each quantized
        # block quantizes its own concat input (the unfused scheme).
        feats = [x.astype(dtype)]
        for spec in specs:
            inp = jnp.concatenate(feats, axis=-1)
            out, _ = _block_forward(
                mcfg, spec, params[spec["name"]], stats.get(spec["name"]),
                quant.get(spec["name"]), inp, record, calib_pct)
            feats.append(out)
        h = jnp.concatenate(feats[1:], axis=-1)
        carried = None
    else:
        h = x
        carried = None  # h is int8 at this scale when set
        exit_q = quant.get("__exit__")
        for i, spec in enumerate(specs):
            last = i + 1 == len(specs)
            nxt = (exit_q if last
                   else quant.get(specs[i + 1]["name"]))
            # Stream int8 into the next block only outside calibration
            # (the probe must see every block's float input).
            out_scale = (nxt["act_scale"]
                         if nxt is not None and record is None else None)
            h, carried = _block_forward(
                mcfg, spec, params[spec["name"]], stats.get(spec["name"]),
                quant.get(spec["name"]), h, record, calib_pct,
                in_scale=carried, out_scale=out_scale)
    if record is not None:
        # Head-input range: only consumed by the optional int8 exit.
        record["__head__"] = jnp.percentile(
            jnp.abs(h.astype(jnp.float32)), calib_pct)
    if carried is not None:
        # int8 exit: the final block emitted int8 (its pool ran at 1/4
        # traffic); dequantize for the float 1x1 head. Unlike the
        # interior streaming this is an APPROXIMATION (the head input
        # is quantized), so it lives behind --quant_exit.
        h = (h.astype(jnp.float32) * carried).astype(dtype)
    # Dropout (if configured) is deterministic-identity at inference.
    head = params["ScoreHead_0"]["Conv_0"]
    h = _conv(h.astype(dtype), head["kernel"].astype(dtype), 1, dtype)
    h = h + head["bias"].astype(dtype)
    return h.astype(jnp.float32)


def make_apply(mcfg: ModelConfig):
    """An `apply_fn(variables, x, train=False)` drop-in for
    `model.apply` on the inference path. Runs the int8 path for blocks
    present in variables['quant'], the float mirror otherwise."""

    def apply_fn(variables, x, train: bool = False):
        if train:
            raise ValueError("quantized apply is inference-only")
        return _forward(mcfg, variables, x)

    return apply_fn


# --------------------------------------------------------------------- #
# Calibration + weight quantization
# --------------------------------------------------------------------- #


def calibrate(mcfg: ModelConfig, variables, crops: Sequence[jnp.ndarray],
              calib_pct: float = 99.9) -> Dict[str, float]:
    """Per-block input activation ranges over normalized sample crops.
    Returns {block_name: range} where range is the max over crops of the
    calib_pct percentile of |input| (per-tensor symmetric)."""
    @jax.jit
    def probe(v, x):
        rec: dict = {}
        _forward(mcfg, v, x, record=rec, calib_pct=calib_pct)
        return rec

    ranges: Dict[str, float] = {}
    for crop in crops:
        if crop.ndim == 3:
            crop = crop[None]
        rec = probe(variables, crop)
        for name, val in rec.items():
            v = float(val)
            ranges[name] = max(ranges.get(name, 0.0), v)
    return ranges


def quantize_variables(mcfg: ModelConfig, variables,
                       act_ranges: Dict[str, float],
                       num_input_bands: Optional[int] = None,
                       min_ch: int = 128, exit_int8: bool = False):
    """Transform a float checkpoint tree into the mixed-precision serving
    tree: selected blocks' kernels become int8 with a 'quant' collection
    carrying {act_scale, w_scale}; everything else passes through
    unchanged. Pure load-time transform — checkpoints on disk stay f32."""
    bands = (num_input_bands if num_input_bands is not None
             else mcfg.num_input_bands)
    plan = quant_plan(mcfg, bands, min_ch=min_ch)
    specs = block_specs(mcfg, bands)
    # Shallow-copy at each modified level (works for dict and FrozenDict).
    params = {k: v for k, v in variables["params"].items()}
    quant = {}
    for spec, q in zip(specs, plan):
        if not q:
            continue
        name = spec["name"]
        rng = act_ranges.get(name, 0.0)
        if rng <= 0.0:
            raise ValueError(
                f"no calibration range for quantized block {name}; run "
                f"calibrate() on sample crops first")
        w = np.asarray(params[name]["Conv_0"]["kernel"], np.float32)
        absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
        w_scale = np.maximum(absmax, 1e-12) / 127.0  # (cout,)
        wq = np.round(np.clip(w / w_scale, -127, 127)).astype(np.int8)
        new_conv = dict(params[name]["Conv_0"])
        new_conv["kernel"] = jnp.asarray(wq)
        new_block = dict(params[name])
        new_block["Conv_0"] = new_conv
        params[name] = new_block
        quant[name] = {
            "act_scale": jnp.asarray(rng / 127.0, jnp.float32),
            "w_scale": jnp.asarray(w_scale, jnp.float32),
        }
    if not quant:
        raise ValueError(
            f"int8 quantization selected no blocks (min_ch={min_ch}, "
            f"net={mcfg.net_type}, width={mcfg.width_multiplier}): every "
            f"layer is below the measured win threshold — run without "
            f"--quant or lower --quant_min_ch")
    if exit_int8:
        if _dense_wired(mcfg):
            raise ValueError(
                "exit_int8 requires sequential wiring (the dense-concat "
                "variant has no single exit stream)")
        rng = act_ranges.get("__head__", 0.0)
        if rng <= 0.0:
            raise ValueError(
                "no '__head__' calibration range for exit_int8; run "
                "calibrate() (it records the head input range)")
        quant["__exit__"] = {
            "act_scale": jnp.asarray(rng / 127.0, jnp.float32)}
    out = dict(variables)
    out["params"] = params
    out["quant"] = quant
    return out
