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
) -> str:
    """Serialize `raw pixels -> softmax probs` with everything baked in.

    The exported signature is f32[b, h, w, bands] -> f32[b, h, w, classes]
    with b/h/w symbolic. Returns the export directory path.
    """
    from jax import export as jexport

    model = build_model(cfg.model)
    mean_c = jnp.asarray(np.asarray(mean, np.float32))
    std_c = jnp.asarray(np.asarray(std, np.float32))

    def probs(x):
        logits = model.apply(variables, (x - mean_c) / std_c, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    b, h, w = jexport.symbolic_shape("b, h, w")
    spec = jax.ShapeDtypeStruct(
        (b, h, w, cfg.model.num_input_bands), jnp.float32
    )
    exported = jexport.export(jax.jit(probs), platforms=tuple(platforms))(spec)
    payload = exported.serialize()

    os.makedirs(out_dir, exist_ok=True)
    art_path = os.path.join(out_dir, ARTIFACT)
    with open(art_path, "wb") as f:
        f.write(payload)

    manifest = {
        "format": "jax.export/stablehlo",
        "artifact": ARTIFACT,
        "sha256": hashlib.sha256(payload).hexdigest(),
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

    Needs only jax + the artifact bytes (no model code, no checkpoint)."""

    manifest: dict
    _exported: object

    @classmethod
    def load(cls, export_dir: str) -> "ExportedPredictor":
        from jax import export as jexport

        with open(os.path.join(export_dir, MANIFEST)) as f:
            manifest = json.load(f)
        with open(os.path.join(export_dir, manifest["artifact"]), "rb") as f:
            payload = f.read()
        digest = hashlib.sha256(payload).hexdigest()
        if digest != manifest["sha256"]:
            raise ValueError(
                f"artifact checksum mismatch under {export_dir}: "
                f"manifest says {manifest['sha256'][:12]}…, file is "
                f"{digest[:12]}… — corrupted or tampered export"
            )
        return cls(manifest=manifest, _exported=jexport.deserialize(payload))

    def probs(self, x: np.ndarray) -> np.ndarray:
        """(B, H, W, bands) raw pixels -> (B, H, W, classes) softmax."""
        x = np.asarray(x, np.float32)
        if x.ndim != 4 or x.shape[-1] != self.manifest["num_input_bands"]:
            raise ValueError(
                f"expected (B, H, W, {self.manifest['num_input_bands']}) "
                f"input, got {x.shape}"
            )
        return np.asarray(self._exported.call(x))

    def predict(self, x: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Argmax labels + probabilities for a raw-pixel batch."""
        p = self.probs(x)
        return p.argmax(axis=-1).astype(np.int32), p
