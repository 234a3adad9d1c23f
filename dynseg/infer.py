"""Full-tile multi-scale sliding-window inference — SURVEY.md C14 + C15.

The reference's `validate_test` slides lambda x lambda windows over each
mirror-padded tile for every scale in the schedule, averages softmax
probabilities across overlaps AND across scales, then argmaxes
([R] dynamic.py:≈test_or_validate_whole_images). Its overlap-add runs in
host numpy — here the whole thing stays on device:

  * Test tiles are packed to ONE common padded shape (TileSet) and
    mirror-padded once by max(scales) — so each (scale, window-batch)
    pair compiles exactly one XLA program regardless of tile count.
  * A jitted step gathers a fixed-size batch of windows (static shapes),
    runs the net, softmaxes, and ACCUMULATES prob/count maps in-place
    via a fori_loop of dynamic_update_slice adds (donated buffers — no
    reallocation per batch). This is the legacy jnp overlap-add path;
    the measured default on a single device is the GRID-FOLD below.
  * Grid-fold overlap-add (r5, `window_fold`): the sequential RMW loop
    measured 41% of the whole window pass at s=25 on the v5e (~12 us
    per window of per-op latency, buffer-size independent —
    docs/k3_overlap_probe.json). The λ/2 grid decomposes into k×k
    classes of NON-overlapping windows (k = ceil(s/stride)); each class
    places as one dense pad→transpose→reshape canvas and one
    static-offset add, so a (tile, scale) pass is ONE launch: a scan of
    batched forwards collecting all window probs, then ≤k² dense adds
    (+ a short sequential loop for clamped tail origins). Measured
    1.41×/1.21×/1.12× full-pass at s=25/35/65 on 2048² tiles, bitwise-
    equal counts, probs equal to float-add reorder (~1e-6).
  * Batches are fused into fixed-size lax.scan chunks per launch, with an
    async host loop over chunks: every compiled program is independent of
    the tile size (one bulk + one tail program per scale — a many-tile
    workload of odd sizes never recompiles), while the donated-buffer
    chain keeps launches pipelined past the remote dispatch latency.
  * Ragged final batches are handled with zero-weight padding windows —
    never a dynamic shape.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynseg.config import Config
from dynseg.data.tiles import (IGNORE_LABEL, TileSet, fill_padded_context,
                               mirror_pad)

_fill_padded_context = fill_padded_context  # back-compat (tests, embedders)
from dynseg.metrics import erode_boundaries, scores_from_confusion
from dynseg.models.dilated import build_model


def window_origins(lo: int, hi: int, size: int, stride: int, lim: int) -> List[int]:
    """1-D window origins r (0 <= r <= lim) whose [r, r+size) union covers
    [lo, hi). Origins start size//2 before `lo` (mirror context for edge
    pixels, SURVEY.md C14) and a final snapped window guarantees coverage
    of the right edge."""
    assert hi > lo and lim >= 0 and size >= 1
    first = max(0, lo - size // 2)
    first = min(first, lim)
    origins = list(range(first, min(hi, lim + 1), stride))
    while origins[-1] + size < hi and origins[-1] < lim:
        origins.append(min(lim, origins[-1] + stride))
    if origins[-1] + size < hi:  # lim reached but still uncovered: impossible
        raise ValueError("window cannot cover range")
    # Drop windows fully past hi except one trailing for symmetry of voting.
    out = [r for r in origins if r < hi]
    return out or [min(lim, max(0, lo))]


def _split_uniform(xs: Sequence[int], stride: int) -> Tuple[List[int], List[int]]:
    """Longest uniform-`stride` prefix of window origins + the tail.
    window_origins yields an arithmetic sequence with at most a few
    trailing origins clamped to the buffer limit; the uniform bulk is
    what the grid-fold places densely, the tail keeps the sequential
    RMW path."""
    n = 1
    while n < len(xs) and xs[n] - xs[n - 1] == stride:
        n += 1
    return list(xs[:n]), list(xs[n:])


def _dihedral_img(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Transform k on device (shared convention: ops.dihedral)."""
    from dynseg.ops.dihedral import dihedral

    return dihedral(x, k, jnp)


def _dihedral_inv(x: jnp.ndarray, k: int) -> jnp.ndarray:
    from dynseg.ops.dihedral import dihedral_inv

    return dihedral_inv(x, k, jnp)


# _fill_padded_context moved to dynseg.data.tiles (fill_padded_context)
# so the TRAINING path shares it — back-compat alias below.


class Inferencer:
    """Multi-scale overlap-add predictor over a packed, padded TileSet."""

    def __init__(self, cfg: Config, tiles: TileSet,
                 mesh: Optional[jax.sharding.Mesh] = None):
        """mesh: optional 1-D device mesh (axis "data") for data-parallel
        inference — window batches / dense blocks shard across chips (the
        forwards, where the FLOPs are); the overlap-add runs replicated,
        so every chip holds the full prediction at the end."""
        self.cfg = cfg
        self.model = build_model(cfg.model)
        # Forward used by all predict paths (window/dense/TTA). Swapped to
        # the mixed-int8 functional forward by enable_quant(); jit caches
        # key on the variables tree structure, so float and quantized
        # trees each get their own correctly-bound executable.
        self._apply = self.model.apply
        self.scales = [int(s) for s in cfg.infer.scales]
        # Pad covers both window context and the dense-mode halo.
        self.pad = max(max(self.scales), cfg.infer.dense_halo)
        self.mesh = mesh
        if mesh is not None:
            P = jax.sharding.PartitionSpec
            self._repl = jax.sharding.NamedSharding(mesh, P())
            self._shard_b = jax.sharding.NamedSharding(mesh, P(None, "data"))
        else:
            self._repl = self._shard_b = None
        self.nc = cfg.model.num_classes
        self.n_dev = 1 if mesh is None else mesh.devices.size
        self._accumulate = jax.jit(
            self._accumulate_impl,
            static_argnames=("size",),
            donate_argnames=("prob", "cnt"),
        )
        self._dense = jax.jit(
            self._dense_impl,
            static_argnames=("block", "halo"),
            donate_argnames=("prob",),
        )
        # Grid-fold programs keyed by (scale, stride, rows, cols) — the
        # origin lists fully determine the fold geometry (see
        # _fold_program). jit re-traces per variables-tree structure
        # (float vs quantized) and tile dtype on top of this.
        self._fold_jits: Dict[tuple, tuple] = {}
        self.set_tiles(tiles)

    def set_tiles(self, tiles: TileSet) -> None:
        """Bind (or re-bind) the tile set. Chunked prediction calls this
        per chunk so the jitted wrappers persist — identical bucketed
        shapes hit JAX's in-process executable cache instead of
        re-tracing and re-lowering every chunk."""
        cfg = self.cfg
        # Refuse a stats change BEFORE any rebinding — mean/std are baked
        # into the compiled programs (see below), and a partially-rebound
        # Inferencer after a raise would predict new tiles with old stats.
        if getattr(self, "_stats_bound", None) is not None:
            m0, s0 = self._stats_bound
            if not (np.array_equal(m0, np.asarray(tiles.mean))
                    and np.array_equal(s0, np.asarray(tiles.std))):
                raise ValueError(
                    "set_tiles with different normalization stats — the "
                    "stats are baked into the compiled programs; build a "
                    "new Inferencer instead"
                )
        # Tiles smaller than the packed shape must see REFLECTED context
        # beyond their valid edge, exactly like the reference's per-tile
        # mirror pad ([R] manipulate_border_array; SURVEY.md C14) — the
        # pack's zero fill would leak zeros into their edge windows.
        # NOTE: only valid_hw / padded shape survive as attributes —
        # pinning the TileSet (or the float32 padded copy) would hold
        # dataset-sized host arrays for the Inferencer's lifetime on top
        # of the packed storage copy (review r2; same rule as
        # BalancedPatchSampler). pad_masks=False: inference never reads
        # padded masks.
        padded = _fill_padded_context(
            mirror_pad(tiles, self.pad, pad_masks=False), self.pad)
        self.valid_hw = np.asarray(tiles.valid_hw)
        # Distinct valid shapes gate window_fold="auto": fold programs
        # are per-(h, w, scale), so a many-shape tile set would compile
        # per shape (the legacy chunked path compiles per scale only).
        self._n_distinct_hw = len(
            {(int(a), int(b)) for a, b in self.valid_hw})
        self.padded_hw = padded.images.shape[1:3]
        from dynseg.data.tiles import storage_dtype

        sd = storage_dtype(padded.images)
        packed = padded.images.astype(sd, copy=False)
        del padded
        # Whole-set device residency is the fast path (zero re-upload),
        # but a big test set (hundreds of production tiles) must not OOM:
        # past the budget, tiles stay on host and stream one at a time
        # (predictions are per-tile, so peak HBM = one padded tile).
        budget = int(cfg.infer.hbm_budget_gb * 1024**3)
        self._stream = packed.nbytes > budget
        if self._stream:
            self.images = packed  # host numpy; _tile() uploads on demand
        else:
            self.images = jax.device_put(packed, self._repl)
        # mean/std are CLOSED OVER by the jitted impls, i.e. baked into
        # compiled programs as constants (docs/DESIGN.md scale-proofing
        # rule) — the guard at the top of set_tiles enforces this.
        self._stats_bound = (np.asarray(tiles.mean), np.asarray(tiles.std))
        self.mean = jax.device_put(tiles.mean, self._repl)
        self.std = jax.device_put(tiles.std, self._repl)

    def enable_quant(self, variables):
        """Post-training int8: when cfg.infer.quant == "int8", calibrate
        activation scales on sample crops of the bound tiles, transform
        the float checkpoint tree into the mixed-precision serving tree
        (dynseg/ops/quant.py — deep blocks int8, shallow stem + head
        float, per the v5e measurements in docs/DESIGN.md), switch this
        Inferencer's forward to the quantized apply, and return the
        transformed tree. With quant == "none", returns `variables`
        unchanged. Call BEFORE the first predict; pass the returned tree
        to every subsequent predict call."""
        icfg = self.cfg.infer
        if icfg.quant == "none":
            return variables
        from dynseg.ops import quant as quant_ops

        rng = np.random.default_rng(0)
        num_tiles = int(self.valid_hw.shape[0])
        crops = []
        for i in range(int(icfg.quant_calib_crops)):
            t = i % num_tiles
            h, w = (int(v) for v in self.valid_hw[t])
            s = min(128, h, w)
            y0 = self.pad + int(rng.integers(0, max(1, h - s + 1)))
            x0 = self.pad + int(rng.integers(0, max(1, w - s + 1)))
            crop = jnp.asarray(
                self.images[t, y0:y0 + s, x0:x0 + s]).astype(jnp.float32)
            crops.append((crop - self.mean) / self.std)
        ranges = quant_ops.calibrate(
            self.cfg.model, variables, crops, icfg.quant_calib_pct)
        qvars = quant_ops.quantize_variables(
            self.cfg.model, variables, ranges,
            num_input_bands=int(self.images.shape[-1]),
            min_ch=icfg.quant_min_ch, exit_int8=icfg.quant_exit)
        self._apply = quant_ops.make_apply(self.cfg.model)
        return qvars

    def _tile(self, tile_idx: int) -> jnp.ndarray:
        """Device array of one padded tile (upload on demand in streaming
        mode; a slice of the resident set otherwise — same programs)."""
        if self._stream:
            return jax.device_put(self.images[tile_idx], self._repl)
        return self.images[tile_idx]

    # ------------------------------------------------------------------ #
    def _accumulate_impl(
        self,
        variables,
        tile: jnp.ndarray,  # (Hp, Wp, C) padded tile (raw values)
        prob: jnp.ndarray,  # (Hp, Wp, nc) running softmax sum (donated)
        cnt: jnp.ndarray,  # (Hp, Wp, 1) running vote count (donated)
        origins: jnp.ndarray,  # (NB, B, 2) int32 window top-left corners
        weights: jnp.ndarray,  # (NB, B) float32 (0 = padding window)
        *,
        size: int,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """A CHUNK of window batches in one launch: an outer lax.scan over
        the chunk (amortizes the ~10ms dispatch cost of remote TPUs)
        around batched forward + sequential overlap-add (the
        read-modify-write is ordered, so no scatter races — SURVEY.md §7
        hard part 3). The host loops chunks asynchronously."""
        c = tile.shape[-1]
        # One f32 conversion per launch: XLA's uint8 slice/convert path is
        # pathologically slow per-window (uint8 storage is for HBM/DMA
        # economy, not compute).
        tile = tile.astype(jnp.float32)

        def gather(o):
            w = jax.lax.dynamic_slice(tile, (o[0], o[1], 0), (size, size, c))
            return (w - self.mean) / self.std

        def batch_body(carry, xs):
            prob, cnt = carry
            origins_b, weights_b = xs  # (B,2), (B,)
            windows = jax.vmap(gather)(origins_b)  # (B, s, s, C)
            logits = self._apply(variables, windows, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            probs = probs * weights_b[:, None, None, None]

            def body(i, carry):
                p, n = carry
                o = origins_b[i]
                cur = jax.lax.dynamic_slice(
                    p, (o[0], o[1], 0), (size, size, self.nc)
                )
                p = jax.lax.dynamic_update_slice(
                    p, cur + probs[i], (o[0], o[1], 0)
                )
                curn = jax.lax.dynamic_slice(n, (o[0], o[1], 0), (size, size, 1))
                n = jax.lax.dynamic_update_slice(
                    n, curn + weights_b[i], (o[0], o[1], 0)
                )
                return p, n

            prob, cnt = jax.lax.fori_loop(
                0, origins_b.shape[0], body, (prob, cnt)
            )
            return (prob, cnt), None

        (prob, cnt), _ = jax.lax.scan(
            batch_body, (prob, cnt), (origins, weights)
        )
        return prob, cnt

    # ------------------------------------------------------------------ #
    def _dense_impl(
        self,
        variables,
        tile: jnp.ndarray,  # (Hp, Wp, C) padded tile (raw values)
        prob: jnp.ndarray,  # (Hp, Wp, nc) output buffer (donated)
        starts: jnp.ndarray,  # (NB, D, 2) int32 block corners (padded coords)
        *,
        block: int,
        halo: int,
    ) -> jnp.ndarray:
        """Dense whole-tile inference: ONE forward per pixel. The nets are
        fully convolutional, so a blockwise forward with a halo >= the
        receptive-field radius reproduces the whole-tile forward exactly —
        the TPU-native fast path (~20x less compute than 5-scale window
        voting). Blocks may overlap; overlapping pixels recompute the SAME
        values (halo guarantees it), so plain overwrite is race-free.

        D blocks are processed per scan step (batched forward; D =
        n_dev * dense_block_batch — the batch dim filling the 8-wide
        sublane tiling is worth ~2x conv rate on v5e, mfu_probe r3).
        Under a mesh the D axis is sharded: each chip forwards its
        dense_block_batch blocks, the replicated overwrite loop
        assembles the map."""
        c = tile.shape[-1]
        ext = block + 2 * halo
        # One f32 conversion per launch (see _accumulate_impl).
        tile = tile.astype(jnp.float32)

        def body(prob, st):  # st: (D, 2)
            def cut(o):
                patch = jax.lax.dynamic_slice(
                    tile, (o[0] - halo, o[1] - halo, 0), (ext, ext, c)
                )
                return (patch - self.mean) / self.std

            patches = jax.vmap(cut)(st)  # (D, ext, ext, C)
            logits = self._apply(variables, patches, train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            centers = probs[:, halo : halo + block, halo : halo + block]

            def write(i, prob):
                return jax.lax.dynamic_update_slice(
                    prob, centers[i], (st[i, 0], st[i, 1], 0)
                )

            prob = jax.lax.fori_loop(0, st.shape[0], write, prob)
            return prob, None

        prob, _ = jax.lax.scan(body, prob, starts)
        return prob

    def predict_tile_dense(
        self,
        variables,
        tile_idx: int,
        block: int = 256,
        halo: int = 40,
        return_probs: bool = True,
        tta: Optional[bool] = None,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Dense (single-context, full-receptive-field) prediction.
        Returns (pred (h,w) int32, prob (h,w,nc) float32 or None) in VALID
        coords. With return_probs=False only the uint8 argmax map leaves
        the device — on remote TPUs the float probability map transfer
        (4*nc bytes/px) dominates wall time, not the compute.

        halo must be >= the network's receptive-field radius for exactness
        (~34 px for rate6, ~37 for grsl_rate8; default 40) and <= the tile
        mirror pad. With tta (default cfg.infer.tta) the prob map is the
        8-way dihedral fusion at the same block/halo."""
        from dynseg.models.dilated import receptive_radius

        rad = receptive_radius(self.cfg.model)
        if halo < rad:
            # Legal (halo=0 exports are deliberately approximate) but
            # never silent: pixels within rad-halo of block borders see
            # a truncated receptive field (review r2, round 2).
            import warnings

            warnings.warn(
                f"dense_halo {halo} < receptive radius {rad} of "
                f"{self.cfg.model.net_type}: block-border pixels are "
                f"approximate (pass --dense_halo {rad} for exactness)",
                RuntimeWarning, stacklevel=2)
        if halo > self.pad:
            raise ValueError(  # not assert: vanishes under python -O
                f"dense halo {halo} exceeds the tile mirror pad "
                f"{self.pad}")
        tta = self.cfg.infer.tta if tta is None else tta
        if tta:
            pred, prob = self._tta_device(
                variables, tile_idx, mode="dense", block=block, halo=halo
            )
            return self._finish(pred, prob, None, return_probs=return_probs)
        return self._finish(
            *self._dense_device(variables, tile_idx, block, halo),
            return_probs=return_probs,
        )

    def _dense_device(self, variables, tile_idx: int, block: int, halo: int,
                      override=None):
        """Dense prediction left ON DEVICE (pred uint8, prob, cnt=None) —
        lets validate_test pipeline tile t's map download under tile
        t+1's compute (the fetch is ~1/3 of warm dense wall time on a
        tunneled chip). override=(tile_array, h, w) predicts an explicit
        padded array instead of the packed tile (TTA path)."""
        if override is not None:
            tile_arr, h, w = override
            Hp, Wp = (int(x) for x in tile_arr.shape[:2])
        else:
            h, w = (int(x) for x in self.valid_hw[tile_idx])
            Hp, Wp = self.padded_hw
        max_h = Hp - 2 * self.pad
        max_w = Wp - 2 * self.pad
        b_r = min(block, max_h)
        b_c = min(block, max_w)
        # No floor of 8: a sliver tile (h or w < 8) must clamp all the
        # way down or the halo'd block exceeds the padded extent
        # (dynamic_slice out of range — hit via the TTA override path).
        block_eff = max(1, min(b_r, b_c))

        def starts_1d(extent: int) -> List[int]:
            ss = list(range(self.pad, self.pad + max(1, extent - block_eff + 1), block_eff))
            if ss[-1] + block_eff < self.pad + extent:
                ss.append(self.pad + extent - block_eff)
            return ss

        starts = np.array(
            [(r, c) for r in starts_1d(h) for c in starts_1d(w)], np.int32
        )
        # Group D = n_dev * block_batch blocks per scan step: the mesh
        # axis shards the group across chips AND each chip forwards
        # block_batch blocks in one batched conv — the v5e emitter is
        # ~2x faster with the batch dim filling the 8-wide sublane
        # tiling (mfu_probe, r3). Auto (0): batch 8 when the tile has
        # >= 8 blocks per device, else exactly the remaining blocks —
        # padding a SMALL tile to batch 8 would spend more duplicate
        # compute than the fast shape earns back. Padding duplicates
        # the last start — duplicate blocks recompute identical values,
        # so the overwrite stays exact.
        d = self.n_dev
        bb = int(self.cfg.infer.dense_block_batch)
        if bb <= 0:
            bb = 8 if len(starts) >= 8 * d else max(
                1, -(-len(starts) // d))
        group = d * bb
        n_pad = (-len(starts)) % group
        if n_pad:
            starts = np.concatenate([starts, np.repeat(starts[-1:], n_pad, 0)])
        starts = starts.reshape(-1, group, 2)
        prob = jax.device_put(
            jnp.zeros((Hp, Wp, self.nc), jnp.float32), self._repl
        )
        # Fixed-size launch chunks (see predict_tile): two programs per
        # (block, halo, D) shape, tile-size independent; async chain.
        tile = self._tile(tile_idx) if override is None else tile_arr
        K = max(1, int(self.cfg.infer.dense_scan_chunk))
        nb = len(starts)
        bulk = (nb // K) * K
        for lo in range(0, bulk, K):
            starts_dev = jax.device_put(
                jnp.asarray(starts[lo : lo + K]), self._shard_b
            )
            prob = self._dense(
                variables, tile, prob, starts_dev, block=block_eff, halo=halo
            )
        for j in range(bulk, nb):
            starts_dev = jax.device_put(
                jnp.asarray(starts[j : j + 1]), self._shard_b
            )
            prob = self._dense(
                variables, tile, prob, starts_dev, block=block_eff, halo=halo
            )
        valid = prob[self.pad : self.pad + h, self.pad : self.pad + w]
        pred = jnp.argmax(valid, axis=-1).astype(jnp.uint8)
        return pred, valid, None

    def predict_tile_device(self, variables, tile_idx: int,
                            scales: Optional[Sequence[int]] = None,
                            tta: Optional[bool] = None) -> jnp.ndarray:
        """Dispatch one tile's full prediction per cfg.infer.mode and
        return the DEVICE uint8 argmax map — callers pipeline the host
        download under the next tile's compute (validate_test,
        cli.run_predict). tta averages softmax maps over the 8 dihedral
        transforms (beyond-reference; entirely on device)."""
        tta = self.cfg.infer.tta if tta is None else tta
        if tta:
            pred, _ = self._tta_device(variables, tile_idx, scales)
            return pred
        if self.cfg.infer.mode == "dense":
            pred, _, _ = self._dense_device(
                variables, tile_idx, block=self.cfg.infer.dense_block,
                halo=self.cfg.infer.dense_halo,
            )
        else:
            pred, _, _ = self._window_device(variables, tile_idx, scales)
        return pred

    def _tta_device(self, variables, tile_idx: int,
                    scales: Optional[Sequence[int]] = None,
                    mode: Optional[str] = None,
                    block: Optional[int] = None,
                    halo: Optional[int] = None):
        """Test-time dihedral augmentation: predict each of the 8
        rotations/flips, inverse-transform the softmax maps, average,
        argmax — all on device. Returns (pred u8, fused prob) DEVICE
        arrays; label-only callers download just the uint8 map.

        The TILE-EXACT padded crop is transformed (not the packed array):
        thanks to the per-tile reflect fill, rows/cols [0, h+2*pad) x
        [0, w+2*pad) of the padded pack ARE the solo mirror-padded tile,
        so the valid block stays at [pad : pad+h'] for every transform.
        Costs 8x compute and compiles per distinct tile size (opt-in)."""
        mode = self.cfg.infer.mode if mode is None else mode
        h, w = (int(x) for x in self.valid_hw[tile_idx])
        p = self.pad
        solo = self._tile(tile_idx)[: h + 2 * p, : w + 2 * p]
        acc = None
        for k in range(8):
            tile_k = _dihedral_img(solo, k)
            hk, wk = (w, h) if k % 4 in (1, 3) else (h, w)
            if mode == "dense":
                _, valid_k, _ = self._dense_device(
                    variables, tile_idx,
                    block=self.cfg.infer.dense_block if block is None else block,
                    halo=self.cfg.infer.dense_halo if halo is None else halo,
                    override=(tile_k, hk, wk),
                )
                prob_k = valid_k
            else:
                _, valid_k, cnt_k = self._window_device(
                    variables, tile_idx, scales, override=(tile_k, hk, wk)
                )
                prob_k = valid_k / jnp.maximum(cnt_k, 1e-9)[..., None]
            prob_k = _dihedral_inv(prob_k, k)  # back to (h, w, nc)
            acc = prob_k if acc is None else acc + prob_k
        prob = acc / 8.0
        return jnp.argmax(prob, axis=-1).astype(jnp.uint8), prob

    @staticmethod
    def _finish(pred, prob, cnt, return_probs: bool):
        """Fetch device results to host (the sync point)."""
        pred_np = np.asarray(pred).astype(np.int32)
        if not return_probs:
            return pred_np, None
        prob_np = np.asarray(prob)
        if cnt is not None:
            cnt_np = np.asarray(cnt)
            prob_np = prob_np / np.maximum(cnt_np[..., None], 1e-9)
        return pred_np, prob_np

    # ------------------------------------------------------------------ #
    def predict_tile(
        self,
        variables,
        tile_idx: int,
        scales: Optional[Sequence[int]] = None,
        return_probs: bool = True,
        tta: Optional[bool] = None,
    ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """Softmax-vote prediction for one tile across all scales.
        Returns (pred (h,w) int32, prob (h,w,nc) float32 or None) in VALID
        coords (see predict_tile_dense on why return_probs=False is the
        fast path on remote TPUs). With tta (default cfg.infer.tta) the
        prob map is the 8-way dihedral fusion."""
        tta = self.cfg.infer.tta if tta is None else tta
        if tta:
            pred, prob = self._tta_device(variables, tile_idx, scales,
                                          mode="window")
            return self._finish(pred, prob, None, return_probs=return_probs)
        return self._finish(
            *self._window_device(variables, tile_idx, scales),
            return_probs=return_probs,
        )

    def _use_fold(self, s: int, rows: Sequence[int],
                  cols: Sequence[int]) -> bool:
        """Grid-fold eligibility for one (tile, scale). Single-device
        only (the legacy path shards window batches over the mesh; the
        fold's collected prob buffer would need an all_gather).
        "auto" additionally requires a small distinct-shape count (each
        shape compiles its own fold programs) and bounds the collected
        probs buffer (DYNSEG_FOLD_MEM_GB, default 2.0 — larger tiles
        fall back to the streaming chunked path)."""
        import os

        mode = self.cfg.infer.window_fold
        if mode == "off" or self.n_dev > 1:
            return False
        B = self.cfg.infer.window_batch
        nw = len(rows) * len(cols)
        nb = -(-nw // B)
        est = nb * B * s * s * self.nc * 4
        limit = float(os.environ.get("DYNSEG_FOLD_MEM_GB", "2.0")) * 1e9
        if est > limit:
            return False
        return mode == "on" or self._n_distinct_hw <= 4

    def _fold_program(self, s: int, stride: int, rows: Sequence[int],
                      cols: Sequence[int]):
        """Build (or fetch) the one-launch grid-fold program for a
        (scale, origin-grid): a scan of batched forwards collecting
        every window's softmax probs, then k×k dense class placements
        (disjoint windows per class → pad/transpose/reshape canvas +
        static-offset add) + a sequential RMW loop over the few clamped
        tail origins. Returns (jitted_fn, origins_batched) — both baked
        per key, re-used across tiles of the same shape."""
        key = (s, stride, tuple(rows), tuple(cols))
        hit = self._fold_jits.get(key)
        if hit is not None:
            return hit
        B = self.cfg.infer.window_batch
        rows_u, rows_t = _split_uniform(rows, stride)
        cols_u, cols_t = _split_uniform(cols, stride)
        bulk = [(r, c) for r in rows_u for c in cols_u]
        # Tails: bulk rows × tail cols, plus every tail row in full.
        tails = ([(r, c) for r in rows_u for c in cols_t]
                 + [(r, c) for r in rows_t for c in cols])
        nbu, nt = len(bulk), len(tails)
        origins = np.array(bulk + tails, np.int32).reshape(-1, 2)
        n_pad = (-(nbu + nt)) % B
        if n_pad:
            # Padding windows gather at (0,0); their probs sit past
            # [nbu+nt) in the collected buffer and are never placed.
            origins = np.concatenate(
                [origins, np.zeros((n_pad, 2), np.int32)])
        nb = len(origins) // B
        origins_b = origins.reshape(nb, B, 2)
        nru, ncu = len(rows_u), len(cols_u)
        r0, c0 = rows_u[0], cols_u[0]
        k = -(-s // stride)  # ceil: class spacing k*stride >= s
        kst = k * stride
        nc = self.nc
        tails_np = np.array(tails, np.int32).reshape(-1, 2)

        def impl(variables, tile, prob, cnt, origins):
            tile = tile.astype(jnp.float32)
            c = tile.shape[-1]

            def gather(o):
                w = jax.lax.dynamic_slice(
                    tile, (o[0], o[1], 0), (s, s, c))
                return (w - self.mean) / self.std

            def batch_body(_, ob):
                windows = jax.vmap(gather)(ob)
                logits = self._apply(variables, windows, train=False)
                return None, jax.nn.softmax(
                    logits.astype(jnp.float32), axis=-1)

            _, allprobs = jax.lax.scan(batch_body, None, origins)
            allprobs = allprobs.reshape(nb * B, s, s, nc)
            bulkp = allprobs[:nbu].reshape(nru, ncu, s, s, nc)
            for a in range(k):
                na = len(range(a, nru, k))
                if na == 0:
                    continue
                for b in range(k):
                    nb_ = len(range(b, ncu, k))
                    if nb_ == 0:
                        continue
                    sub = bulkp[a::k, b::k]  # (na, nb_, s, s, nc)
                    canvas = jnp.zeros(
                        (na, kst, nb_, kst, nc), jnp.float32)
                    canvas = canvas.at[:, :s, :, :s, :].set(
                        sub.transpose(0, 2, 1, 3, 4))
                    canvas = canvas.reshape(na * kst, nb_ * kst, nc)
                    R = (na - 1) * kst + s
                    C = (nb_ - 1) * kst + s
                    canvas = canvas[:R, :C]
                    ra, cb = r0 + a * stride, c0 + b * stride
                    prob = prob.at[ra:ra + R, cb:cb + C, :].add(canvas)
                    ones = jnp.zeros(
                        (kst, kst, 1), jnp.float32).at[:s, :s].set(1.0)
                    cnt = cnt.at[ra:ra + R, cb:cb + C, :].add(
                        jnp.tile(ones, (na, nb_, 1))[:R, :C])
            if nt:
                tailp = jax.lax.dynamic_slice(
                    allprobs, (nbu, 0, 0, 0), (nt, s, s, nc))
                tailo = jnp.asarray(tails_np)

                def body(i, carry):
                    p, n = carry
                    o = tailo[i]
                    cur = jax.lax.dynamic_slice(
                        p, (o[0], o[1], 0), (s, s, nc))
                    p = jax.lax.dynamic_update_slice(
                        p, cur + tailp[i], (o[0], o[1], 0))
                    curn = jax.lax.dynamic_slice(
                        n, (o[0], o[1], 0), (s, s, 1))
                    n = jax.lax.dynamic_update_slice(
                        n, curn + 1.0, (o[0], o[1], 0))
                    return p, n

                prob, cnt = jax.lax.fori_loop(0, nt, body, (prob, cnt))
            return prob, cnt

        fn = jax.jit(impl, donate_argnames=("prob", "cnt"))
        self._fold_jits[key] = (fn, origins_b)
        return self._fold_jits[key]

    def _window_device(self, variables, tile_idx: int,
                       scales: Optional[Sequence[int]] = None,
                       override=None):
        """Window-voting prediction left ON DEVICE (see _dense_device)."""
        scales = [int(s) for s in (scales or self.scales)]
        if override is not None:
            tile, h, w = override
            Hp, Wp = (int(x) for x in tile.shape[:2])
        else:
            h, w = (int(x) for x in self.valid_hw[tile_idx])
            Hp, Wp = self.padded_hw
            tile = self._tile(tile_idx)
        prob = jax.device_put(
            jnp.zeros((Hp, Wp, self.nc), jnp.float32), self._repl
        )
        cnt = jax.device_put(
            jnp.zeros((Hp, Wp, 1), jnp.float32), self._repl
        )
        B = self.cfg.infer.window_batch
        if self.n_dev > 1:
            B = max(self.n_dev, B // self.n_dev * self.n_dev)

        K = max(1, int(self.cfg.infer.scan_chunk))
        for s in scales:
            # Clamp to the window size: a larger stride would leave
            # zero-vote holes between windows (silent class-0 pixels).
            stride = min(s, max(1, int(round(s * self.cfg.infer.stride_fraction))))
            rows = window_origins(self.pad, self.pad + h, s, stride, Hp - s)
            cols = window_origins(self.pad, self.pad + w, s, stride, Wp - s)
            if self._use_fold(s, rows, cols):
                fn, origins_b = self._fold_program(s, stride, rows, cols)
                prob, cnt = fn(variables, tile, prob, cnt,
                               jnp.asarray(origins_b))
                continue
            origins = np.array(
                [(r, c) for r in rows for c in cols], dtype=np.int32
            )
            n = len(origins)
            n_pad = (-n) % B
            if n_pad:
                origins = np.concatenate(
                    [origins, np.zeros((n_pad, 2), np.int32)], axis=0
                )
            weights = np.concatenate(
                [np.ones(n, np.float32), np.zeros(n_pad, np.float32)]
            )
            nb = len(origins) // B
            origins = origins.reshape(nb, B, 2)
            weights = weights.reshape(nb, B)
            # Fixed-size launch chunks (K scan steps) + single-step tail
            # launches: exactly TWO programs per (scale, B) regardless of
            # tile shape, and no sync between launches — the donated
            # prob/cnt chain pipelines host dispatch under device compute.
            # Window batches shard over the mesh (axis 1 of (K, B, 2)):
            # the forwards parallelize, the overlap-add runs replicated.
            bulk = (nb // K) * K
            for lo in range(0, bulk, K):
                origins_dev = jax.device_put(
                    jnp.asarray(origins[lo : lo + K]), self._shard_b
                )
                weights_dev = jax.device_put(
                    jnp.asarray(weights[lo : lo + K]), self._shard_b
                )
                prob, cnt = self._accumulate(
                    variables, tile, prob, cnt, origins_dev, weights_dev, size=s
                )
            for j in range(bulk, nb):
                origins_dev = jax.device_put(
                    jnp.asarray(origins[j : j + 1]), self._shard_b
                )
                weights_dev = jax.device_put(
                    jnp.asarray(weights[j : j + 1]), self._shard_b
                )
                prob, cnt = self._accumulate(
                    variables, tile, prob, cnt, origins_dev, weights_dev, size=s
                )

        valid = prob[self.pad : self.pad + h, self.pad : self.pad + w]
        pred = jnp.argmax(valid, axis=-1).astype(jnp.uint8)
        cnt_valid = cnt[self.pad : self.pad + h, self.pad : self.pad + w, 0]
        return pred, valid, cnt_valid


def validate_test(
    cfg: Config,
    variables,
    test_tiles: TileSet,
    scales: Optional[Sequence[int]] = None,
    log=print,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> Dict[str, object]:
    """Reference `validate_test` entry: predict every test tile with
    multi-scale fusion, report OA / kappa / per-class F1 / confusion
    ([R] dynamic.py:≈validate_test; SURVEY.md §3.2). Returns metrics plus
    per-tile prediction maps for export (C18)."""
    inf = Inferencer(cfg, test_tiles, mesh=mesh)
    if cfg.infer.quant != "none":
        variables = inf.enable_quant(variables)
        blocks = sorted(k for k in variables["quant"]
                        if not k.startswith("__"))
        log(f"int8 serving path: quantized blocks {blocks}"
            f"{' + int8 exit' if '__exit__' in variables['quant'] else ''}"
            f" (min_ch={cfg.infer.quant_min_ch}, calib pct="
            f"{cfg.infer.quant_calib_pct} over "
            f"{cfg.infer.quant_calib_crops} crops)")
    if cfg.infer.mode == "dense":
        log(
            "NOTE: dense mode is a whole-tile estimator; patch-trained "
            "models expect zero-padding context (receptive field > patch), "
            "so accuracy may differ from reference-parity window voting."
        )
    nc = cfg.model.num_classes
    cm = np.zeros((nc, nc), np.int64)
    erode_r = int(cfg.infer.eroded_boundary_radius)
    cm_eroded = np.zeros((nc, nc), np.int64) if erode_r > 0 else None
    preds: List[np.ndarray] = []

    # Pipeline: tile t+1's launches are enqueued before tile t's map is
    # downloaded, so the (tunnel-bound) fetch overlaps device compute.
    def launch(t):
        return inf.predict_tile_device(variables, t, scales)

    import time as _time

    t_infer0 = _time.perf_counter()  # after Inferencer setup/upload —
    # scores["infer_wall_s"] is pure predict+score time, so benchmark
    # drivers (scripts/mode_gap.py) don't charge dataset regeneration or
    # checkpoint restore to the mode they're comparing (review r2, r2)
    pending = launch(0) if test_tiles.num_tiles else None
    for t in range(test_tiles.num_tiles):
        nxt = launch(t + 1) if t + 1 < test_tiles.num_tiles else None
        pred = np.asarray(pending).astype(np.int32)
        pending = nxt
        preds.append(pred)
        h, w = (int(x) for x in test_tiles.valid_hw[t])
        gt = test_tiles.masks[t, :h, :w]

        def tile_cm(mask):
            valid = mask != IGNORE_LABEL
            idx = mask[valid] * nc + pred[valid]
            return np.bincount(idx.ravel(), minlength=nc * nc).reshape(nc, nc)

        tcm = tile_cm(gt)
        cm += tcm
        tile_scores = scores_from_confusion(tcm)
        log(
            f"tile {t}: OA={tile_scores['oa']:.4f} kappa={tile_scores['kappa']:.4f} "
            f"meanF1={tile_scores['mean_f1']:.4f}"
        )
        if cm_eroded is not None:
            # ISPRS protocol: score against boundary-eroded GT too.
            cm_eroded += tile_cm(erode_boundaries(gt, erode_r))
    scores = scores_from_confusion(cm)
    scores["predictions"] = preds
    scores["infer_wall_s"] = round(_time.perf_counter() - t_infer0, 4)
    log(
        f"TOTAL: OA={scores['oa']:.4f} kappa={scores['kappa']:.4f} "
        f"meanF1={scores['mean_f1']:.4f} "
        f"F1={np.array2string(scores['f1'], precision=4)}"
    )
    if cm_eroded is not None:
        es = scores_from_confusion(cm_eroded)
        scores["eroded"] = es
        log(
            f"TOTAL (boundaries eroded {erode_r}px, ISPRS protocol): "
            f"OA={es['oa']:.4f} kappa={es['kappa']:.4f} "
            f"meanF1={es['mean_f1']:.4f} "
            f"F1={np.array2string(es['f1'], precision=4)}"
        )
    return scores
