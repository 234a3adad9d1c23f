"""Serving export: standalone StableHLO predictor artifacts.

The reference has no deployment story — to predict it re-runs the training
script against a `tf.train.Saver` checkpoint, which needs the full Python
source tree ([R] dynamic.py:≈validate_test restore path; SURVEY.md C16).
For production serving we export the trained predictor through `jax.export`
instead:

  * ONE shape-polymorphic artifact per checkpoint. The networks are fully
    convolutional (stride-1/SAME everywhere — SURVEY.md §3.3), so a single
    exported function with symbolic (batch, height, width) dims serves
    EVERY patch scale (25–65 px windows) and every dense-mode block size;
    consumers compile it per concrete shape on first use.
  * Parameters, batch-norm statistics, and the training normalization
    (mean/std) are baked in as constants: callers pass RAW pixel values
    and get per-pixel softmax probabilities back. No dynseg, flax, or
    checkpoint code is needed at serving time — only a StableHLO runtime
    (`jax.export.deserialize(...).call` here; the same bytes load from
    any PJRT/XlaCallModule consumer).
  * Multi-platform lowering (TPU + CPU by default): the artifact trained
    on a TPU pod serves on CPU edge boxes unchanged.

Artifacts on disk (under <output_path>/export/):
    predictor.stablehlo   serialized jax.export payload
    manifest.json         model/provenance metadata + artifact checksum
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynseg.config import Config
from dynseg.models.dilated import build_model

ARTIFACT = "predictor.stablehlo"
MANIFEST = "manifest.json"


def export_predictor(
    cfg: Config,
    variables,
    mean: np.ndarray,
    std: np.ndarray,
    out_dir: str,
    platforms: Sequence[str] = ("tpu", "cpu"),
    extra_meta: Optional[dict] = None,
    quant_variables=None,
) -> str:
    """Serialize the predictor with everything baked in. THREE entry
    points are exported (all b/h/w-symbolic), because on a remote/tunneled
    accelerator the serving bottleneck is host<->device transfer, not
    compute (docs/DESIGN.md "throughput model"):

      probs          f32[b,h,w,C] -> f32[b,h,w,nc]   generic / window voting
      probs_u8       u8 [b,h,w,C] -> f32[b,h,w,nc]   4x smaller upload for
                                                      PNG-native rasters
      dense_labels   u8 [b,h,w,C] -> u8[b,h-2k,w-2k]  k = dense_halo; argmax
                                                      on device, halo cropped
                                                      — ~100x smaller download
                                                      for the labels fast path

    Returns the export directory path.
    """
    from jax import export as jexport

    model = build_model(cfg.model)
    if quant_variables is not None:
        # Mixed-precision int8 serving artifact (ops/quant.py): int8
        # weights + scales are baked in exactly like the float params —
        # the artifact stays self-contained and serve.py is unchanged.
        from dynseg.ops.quant import make_apply

        apply_fn, bound_vars = make_apply(cfg.model), quant_variables
    else:
        apply_fn, bound_vars = model.apply, variables
    mean_c = jnp.asarray(np.asarray(mean, np.float32))
    std_c = jnp.asarray(np.asarray(std, np.float32))
    halo = int(cfg.infer.dense_halo)

    def probs(x):
        x = x.astype(jnp.float32)
        logits = apply_fn(bound_vars, (x - mean_c) / std_c, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def dense_labels(x):
        p = probs(x)
        if halo > 0:  # halo=0 would slice [0:-0] == empty
            p = p[:, halo:-halo, halo:-halo]
        return jnp.argmax(p, axis=-1).astype(jnp.uint8)

    def _export(fn, dtype):
        b, h, w = jexport.symbolic_shape("b, h, w")
        spec = jax.ShapeDtypeStruct(
            (b, h, w, cfg.model.num_input_bands), dtype
        )
        return jexport.export(jax.jit(fn), platforms=tuple(platforms))(
            spec).serialize()

    os.makedirs(out_dir, exist_ok=True)
    payloads = {
        "probs": (ARTIFACT, _export(probs, jnp.float32)),
        "probs_u8": ("predictor_u8.stablehlo", _export(probs, jnp.uint8)),
        "dense_labels": ("dense_labels_u8.stablehlo",
                         _export(dense_labels, jnp.uint8)),
    }
    arts = {}
    for name, (fname, payload) in payloads.items():
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(payload)
        arts[name] = {"file": fname,
                      "sha256": hashlib.sha256(payload).hexdigest()}

    manifest = {
        "format": "jax.export/stablehlo",
        "artifact": ARTIFACT,          # back-compat alias of artifacts.probs
        "artifacts": arts,
        "sha256": arts["probs"]["sha256"],
        "dense_labels_halo": halo,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "signature": {
            "input": f"f32[b, h, w, {cfg.model.num_input_bands}] raw pixel values",
            "output": f"f32[b, h, w, {cfg.model.num_classes}] softmax probabilities",
        },
        "net_type": cfg.model.net_type,
        "num_classes": cfg.model.num_classes,
        "num_input_bands": cfg.model.num_input_bands,
        "compute_dtype": cfg.model.compute_dtype,
        # Derived from the artifact's ACTUAL contents, not cfg — a caller
        # passing quant_variables with a default cfg must not produce a
        # manifest claiming quant='none' over an int8 payload (review).
        "quant": ("int8" if quant_variables is not None else "none"),
        "quant_blocks": (sorted(
            k for k in quant_variables["quant"] if not k.startswith("__"))
            if quant_variables is not None else []),
        "quant_exit": (quant_variables is not None
                       and "__exit__" in quant_variables["quant"]),
        # Baked into the graph; recorded for audit only.
        "normalization": {
            "mean": np.asarray(mean).tolist(),
            "std": np.asarray(std).tolist(),
        },
        # Serving hints: the scales the model was trained to see, and the
        # window-voting recipe (SURVEY.md C15) a server should replicate
        # for reference-parity accuracy.
        "train_scales": list(cfg.sched.values),
        "inference": {
            "window_scales": list(cfg.infer.scales),
            "stride_fraction": cfg.infer.stride_fraction,
            "dense_halo": cfg.infer.dense_halo,
        },
    }
    manifest.update(extra_meta or {})
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2)
    return out_dir


@dataclasses.dataclass
class ExportedPredictor:
    """Loaded serving artifact: `.probs(raw_pixels)` / `.predict(raw)`.

    Needs only jax + the artifact bytes (no model code, no checkpoint).
    The `*_device` variants return jax arrays WITHOUT forcing the value —
    calls dispatch asynchronously, so a caller iterating blocks can
    enqueue them all and convert at the end (remote-TPU pipelining)."""

    manifest: dict
    _fns: dict
    _payloads: dict

    @classmethod
    def load(cls, export_dir: str) -> "ExportedPredictor":
        from jax import export as jexport

        with open(os.path.join(export_dir, MANIFEST)) as f:
            manifest = json.load(f)
        # Pre-multi-artifact manifests have only the top-level alias.
        arts = manifest.get("artifacts") or {
            "probs": {"file": manifest["artifact"],
                      "sha256": manifest["sha256"]},
        }
        payloads = {}
        for name, rec in arts.items():
            with open(os.path.join(export_dir, rec["file"]), "rb") as f:
                payload = f.read()
            digest = hashlib.sha256(payload).hexdigest()
            if digest != rec["sha256"]:
                raise ValueError(
                    f"artifact checksum mismatch for {rec['file']} under "
                    f"{export_dir}: manifest says {rec['sha256'][:12]}…, "
                    f"file is {digest[:12]}… — corrupted or tampered export"
                )
            payloads[name] = payload
        # Integrity is checked eagerly; deserialization is deferred per
        # entry — probs-only consumers (CLI validate/predict) never pay
        # for the serving fast-path artifacts.
        return cls(manifest=manifest, _fns={}, _payloads=payloads)

    def has(self, name: str) -> bool:
        return name in self._payloads or name in self._fns

    def _fn(self, name: str):
        if name not in self._fns:
            from jax import export as jexport

            self._fns[name] = jexport.deserialize(self._payloads.pop(name))
        return self._fns[name]

    def _check(self, x: np.ndarray) -> None:
        if x.ndim != 4 or x.shape[-1] != self.manifest["num_input_bands"]:
            raise ValueError(
                f"expected (B, H, W, {self.manifest['num_input_bands']}) "
                f"input, got {x.shape}"
            )

    def probs_device(self, x: np.ndarray):
        """Async: (B, H, W, bands) raw pixels -> device f32 softmax array.
        uint8 input routes through the 4x-smaller-upload entry point."""
        if np.asarray(x).dtype == np.uint8 and self.has("probs_u8"):
            x = np.ascontiguousarray(x)
            self._check(x)
            return self._fn("probs_u8").call(x)
        x = np.asarray(x, np.float32)
        self._check(x)
        return self._fn("probs").call(x)

    def probs(self, x: np.ndarray) -> np.ndarray:
        """(B, H, W, bands) raw pixels -> (B, H, W, classes) softmax."""
        return np.asarray(self.probs_device(x))

    def dense_labels_device(self, x: np.ndarray):
        """Async: u8 raw pixels (halo included) -> device u8 argmax labels
        with the manifest's dense_labels_halo cropped off. The labels
        fast path: ~100x smaller download than f32 probabilities."""
        x = np.ascontiguousarray(np.asarray(x).astype(np.uint8))
        self._check(x)
        return self._fn("dense_labels").call(x)

    def predict(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Argmax labels + probabilities for a raw-pixel batch."""
        p = self.probs(x)
        return p.argmax(axis=-1).astype(np.int32), p
