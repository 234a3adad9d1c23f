"""Prediction-map export — SURVEY.md C18.

Writes colorized per-tile prediction PNGs using the per-dataset class
palette (ISPRS submission format / visual inspection), like the
reference's create_prediction_map ([R] dynamic.py:≈prediction export)."""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

from dynseg.data.datasets import PALETTES


def save_prediction_maps(
    preds: Sequence[np.ndarray],
    dataset: str,
    output_path: str,
    prefix: str = "prediction",
    names: Sequence[str] = (),
) -> list:
    from PIL import Image

    palette = PALETTES[dataset]
    os.makedirs(output_path, exist_ok=True)
    paths = []
    for i, pred in enumerate(preds):
        n = int(np.max(pred)) + 1 if pred.size else 1
        if n > len(palette):  # distinct colors instead of a silent clip
            extra = (np.arange(len(palette), n)[:, None]
                     * np.array([97, 57, 17]) + np.array([13, 101, 197])) % 255
            palette = np.concatenate([palette, extra.astype(np.uint8)])
        safe = np.clip(pred, 0, len(palette) - 1)
        rgb = palette[safe]
        tag = names[i] if i < len(names) else str(i)
        p = os.path.join(output_path, f"{prefix}_{tag}.png")
        Image.fromarray(rgb).save(p)
        paths.append(p)
    return paths
