"""Training engine — SURVEY.md C11 (loss/optimizer) + C13 (train loop).

TPU-first design, not a translation of the reference's tf.Session loop:

  * ONE jitted `train_step` traced per patch-size bucket (static shapes —
    the TF trick of H=W=None placeholders becomes per-lambda pre-compiled
    XLA programs; zero mid-training recompiles, SURVEY.md C12).
  * The on-device K2 gather (dynseg.ops.gather) is fused INTO the step:
    positions/augment-ids (a few KB) are the only host->device transfer
    per iteration; patches never exist on the host.
  * Data parallelism: a 1-D `jax.sharding.Mesh` over axis "data"; the
    batch dimension of positions/aug_ids is sharded, tiles and params are
    replicated, and XLA inserts the gradient all-reduce over ICI
    (SURVEY.md §2 parallelism table — no NCCL/MPI analog needed).
  * Loss: per-pixel softmax cross-entropy averaged over valid pixels +
    L2 weight decay on conv kernels, momentum SGD — matching the
    reference's loss-coupled decay ([R] dynamic.py:≈graph build, C11):
    optax.add_decayed_weights BEFORE sgd(momentum) reproduces
    d(loss + wd/2*||w||^2)/dw fed to the momentum accumulator.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from dynseg.config import Config
from dynseg.data.sampler import BalancedPatchSampler
from dynseg.data.tiles import (IGNORE_LABEL, TileSet, fill_padded_context,
                               mirror_pad)
from dynseg.metrics import balanced_batch_accuracy, batch_accuracy, confusion_matrix
from dynseg.models.dilated import build_model
from dynseg.ops.gather import gather_batch
from dynseg.sched.scheduler import ScaleScheduler


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def init_state_template(cfg: Config, rng: Optional[jax.Array] = None) -> TrainState:
    """Freshly-initialized TrainState with the shapes/dtypes a checkpoint
    of this config restores into. Standalone (no Trainer / no training
    tiles) so the predict path can restore a model without the training
    dataset on disk."""
    model = build_model(cfg.model)
    s0 = int(cfg.sched.values[0])
    x = jnp.zeros((1, s0, s0, cfg.model.num_input_bands), jnp.float32)
    variables = model.init(rng if rng is not None else jax.random.key(0),
                           x, train=False)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", FrozenDict()),
        opt_state=make_optimizer(cfg).init(params),
    )


class EmaParamsState(struct.PyTreeNode):
    """State for track_ema: the EMA iterate of the PARAMS (not of the
    updates, which is what optax.ema smooths)."""

    ema: Any


def track_ema(decay: float) -> optax.GradientTransformation:
    """Maintain a per-step exponential moving average of the params
    INSIDE the optimizer state.

    Appended LAST to the optax chain, its `update` sees the final deltas
    and the pre-update params, so `params + updates` is exactly the new
    iterate that optax.apply_updates produces — one fused multiply-add
    per parameter per step, on device, inside the existing train_step
    program. Living in opt_state (rather than a new TrainState field)
    keeps the checkpoint tree layout byte-compatible with pre-EMA
    checkpoints whenever EMA is off: orbax refuses to restore a tree
    whose structure changed, even by a None leaf (measured — see
    tests/test_train.py EMA cases).

    Warm-started at params_0, so no bias correction is needed (the
    standard vision-EMA convention)."""

    def init(params):
        # DISTINCT buffers, not aliases of params: the train step donates
        # the whole TrainState, and donating the same buffer twice
        # (params + an aliased ema) is an XLA execute error.
        return EmaParamsState(ema=jax.tree.map(jnp.copy, params))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("track_ema requires params")
        new_ema = jax.tree.map(
            lambda e, p, u: decay * e + (1.0 - decay) * (p + u),
            state.ema, params, updates,
        )
        return updates, EmaParamsState(ema=new_ema)

    return optax.GradientTransformation(init, update)


def ema_params(cfg: Config, state: TrainState):
    """The EMA weights tracked by track_ema, or None when EMA is off.
    The chain is (add_decayed_weights, sgd, track_ema) — see
    make_optimizer — so the EMA state is the last chain element."""
    if cfg.train.ema_decay <= 0.0:
        return None
    return state.opt_state[-1].ema


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Momentum SGD + L2 on conv kernels (SURVEY.md C11; lr/momentum/wd
    from the reference CLI flags). With ema_decay > 0 a params-EMA
    tracker rides at the end of the chain (track_ema)."""
    t = cfg.train
    if t.lr_decay_rate < 1.0:
        lr = optax.exponential_decay(
            t.learning_rate, t.lr_decay_steps, t.lr_decay_rate, staircase=True
        )
    else:
        lr = t.learning_rate

    def decay_mask(params):
        # L2 only on conv kernels — biases and BN scale/offset excluded,
        # mirroring _variable_with_weight_decay ([R] dynamic.py:≈helpers).
        return jax.tree_util.tree_map_with_path(
            lambda path, _: any(
                getattr(p, "key", None) == "kernel" for p in path
            ),
            params,
        )

    parts = [
        optax.add_decayed_weights(t.weight_decay, mask=decay_mask),
        optax.sgd(lr, momentum=t.momentum),
    ]
    if t.ema_decay > 0.0:
        parts.append(track_ema(t.ema_decay))
    return optax.chain(*parts)


def masked_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean per-pixel softmax CE over valid (non-IGNORE) pixels
    ([R] dynamic.py:≈sparse_softmax_cross_entropy_with_logits; C11)."""
    valid = labels != IGNORE_LABEL
    safe = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, safe)
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid), 1)


class Trainer:
    """Owns model, optimizer, per-bucket compiled steps, and the DP mesh."""

    def __init__(self, cfg: Config, train_tiles: TileSet, mesh: Optional[jax.sharding.Mesh] = None):
        self.cfg = cfg
        self.model = build_model(cfg.model)
        self.tx = make_optimizer(cfg)
        self.scales = [int(v) for v in cfg.sched.values]
        self.pad = max(self.scales) // 2 + 1

        if mesh is None:
            n = cfg.train.num_devices
            devs = np.array(jax.devices()[:n])
            if len(devs) != n:  # ValueError, not assert (vanishes under -O)
                raise ValueError(
                    f"--num_devices {n} but only {len(jax.devices())} "
                    f"devices are visible")
            mesh = jax.sharding.Mesh(devs, ("data",))
        self.mesh = mesh
        n_dev = int(mesh.devices.size)
        self.shard_tiles = bool(cfg.train.shard_tiles) and n_dev > 1
        P = jax.sharding.PartitionSpec
        self.repl = jax.sharding.NamedSharding(mesh, P())
        self.batch_sharded = jax.sharding.NamedSharding(mesh, P("data"))
        self.tile_sharded = jax.sharding.NamedSharding(mesh, P("data"))

        # Fail fast (before any multi-GB host work) if the tile set cannot
        # possibly be device-resident even as uint8 (image C bytes/px +
        # 1 label byte/px): ~16 GB/chip HBM minus activation headroom.
        # Tile sharding divides the requirement across the mesh.
        t, h, w, c = train_tiles.images.shape
        min_bytes = t * (h + 2 * self.pad) * (w + 2 * self.pad) * (c + 1)
        budget = 12 * 1024**3 * (n_dev if self.shard_tiles else 1)
        if min_bytes > budget:
            raise MemoryError(
                f"tile set needs >= {min_bytes / 1e9:.1f} GB of device HBM "
                f"even at uint8 storage; shard it across more chips "
                f"(--shard_tiles with a larger --num_devices) or train "
                f"per-region"
            )

        # Mirror-pad once so any scheduled patch size centered on a valid
        # pixel stays in-bounds (SURVEY.md C14 + sampler contract).
        # fill_padded_context: patches near the valid edge of tiles
        # SMALLER than the packed shape must see the tile's own mirrored
        # context, not the pack's zero slack — inference always had this
        # (review r2, round 2: training silently lost reference parity on
        # exactly the variably-sized ISPRS tile sets). Masks stay IGNORE
        # in the slack, so sampling and loss are untouched.
        padded = fill_padded_context(mirror_pad(train_tiles, self.pad),
                                     self.pad)

        # Device-resident tiles. Replicated by default (every chip gathers
        # its own batch shard locally — no patch traffic over ICI); with
        # --shard_tiles the TILE axis splits across the mesh instead and
        # each chip samples/gathers from its local shard only. uint8
        # storage when lossless: 4x less HBM + gather-DMA traffic.
        from dynseg.data.tiles import storage_dtype

        sd = storage_dtype(padded.images)
        images_np = padded.images.astype(sd)
        masks_np = padded.masks.astype(np.uint8)
        sampler_kw = dict(
            num_classes=cfg.model.num_classes,
            pad=self.pad,
            balanced=cfg.data.balanced_sampling,
            max_positions_per_class=cfg.data.max_positions_per_class,
        )
        if self.shard_tiles:
            t_pad = (-t) % n_dev  # dummy all-IGNORE tiles: never sampled
            if t_pad:
                images_np = np.concatenate(
                    [images_np, np.zeros((t_pad,) + images_np.shape[1:], sd)]
                )
                masks_np = np.concatenate(
                    [masks_np,
                     np.full((t_pad,) + masks_np.shape[1:], 255, np.uint8)]
                )
                # Interleave so the dummies SPREAD across device shards:
                # appended-in-place they would fill whole trailing shards
                # (device n-1 gets only IGNORE tiles -> unusable). Device
                # d's contiguous block becomes tiles {d, d+n, d+2n, ...}.
                total = images_np.shape[0]
                order = np.concatenate(
                    [np.arange(d, total, n_dev) for d in range(n_dev)])
                images_np = images_np[order]
                masks_np = masks_np[order]
            tpd = images_np.shape[0] // n_dev  # tiles per device
            self.tiles_per_device = tpd
            import dataclasses as _dc

            self.samplers = []
            for d in range(n_dev):
                shard = _dc.replace(
                    padded,
                    images=images_np[d * tpd : (d + 1) * tpd],
                    masks=masks_np[d * tpd : (d + 1) * tpd],
                )
                try:
                    self.samplers.append(BalancedPatchSampler(
                        shard, seed=cfg.train.seed + 31 * d, **sampler_kw))
                except ValueError as e:
                    raise ValueError(
                        f"--shard_tiles: device {d}'s tile shard has no "
                        f"labeled pixels — use more tiles or fewer devices"
                    ) from e
            self.sampler = self.samplers[0]  # augment-id rng source
            self.images = jax.device_put(images_np, self.tile_sharded)
            self.masks = jax.device_put(masks_np, self.tile_sharded)
        else:
            self.sampler = BalancedPatchSampler(
                padded, seed=cfg.train.seed, **sampler_kw)
            self.samplers = [self.sampler]
            self.images = jax.device_put(images_np, self.repl)
            self.masks = jax.device_put(masks_np, self.repl)
        self.mean = jax.device_put(padded.mean, self.repl)
        self.std = jax.device_put(padded.std, self.repl)

        self._train_step = jax.jit(
            self._chunk_impl,
            static_argnames=("size",),
            donate_argnames=("state",),
        )
        self._eval_step = jax.jit(self._eval_impl, static_argnames=("size",))

    # ------------------------------------------------------------------ #
    def init_state(self, rng: jax.Array) -> TrainState:
        return jax.device_put(init_state_template(self.cfg, rng), self.repl)

    def reseed_samplers(self, salt: int) -> None:
        """Resume support: fold the restart iteration into every
        sampler's position stream (see BalancedPatchSampler.reseed)."""
        for s in self.samplers:
            s.reseed(salt)

    # ------------------------------------------------------------------ #
    def _chunk_impl(
        self,
        state: TrainState,
        images: jnp.ndarray,  # tiles passed as ARGUMENTS, never closed
        masks: jnp.ndarray,  # over: closures embed arrays as constants in
        mean: jnp.ndarray,  # the compile payload (a production tile set
        std: jnp.ndarray,  # overflows the remote compiler's request limit)
        positions: jnp.ndarray,  # (K, B, 3) — K steps fused in ONE launch
        aug_ids: jnp.ndarray,  # (K, B)
        dropout_rngs: jax.Array,  # (K,) keys
        *,
        size: int,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """K optimizer steps per device launch via lax.scan.

        Dispatch overhead on a tunneled/remote TPU runs ~10 ms per launch
        (measured) while the device step itself is ~4 ms — scanning K
        steps inside one XLA program amortizes it away. K=1 reproduces
        the reference's strictly per-batch loop; K>1 trades scheduler
        feedback latency (scores update once per chunk) for throughput.
        Returned metrics are chunk means."""

        if positions.shape[0] == 1:
            # K=1: skip the scan — XLA-CPU disables intra-op parallelism
            # inside loop bodies (60x slower there), and a bare step is
            # identical math.
            return self._step_impl(
                state, images, masks, mean, std,
                positions[0], aug_ids[0], dropout_rngs[0], size,
            )

        def body(st, xs):
            pos, aug, rng = xs
            return self._step_impl(
                st, images, masks, mean, std, pos, aug, rng, size
            )

        state, ms = jax.lax.scan(body, state, (positions, aug_ids, dropout_rngs))
        return state, jax.tree.map(lambda m: jnp.mean(m, axis=0), ms)

    def _step_impl(
        self,
        state: TrainState,
        images: jnp.ndarray,
        masks: jnp.ndarray,
        mean: jnp.ndarray,
        std: jnp.ndarray,
        positions: jnp.ndarray,
        aug_ids: jnp.ndarray,
        dropout_rng: jax.Array,
        size: int,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if self.shard_tiles:
            # Tiles live sharded across the mesh: each device gathers its
            # batch shard from ITS tile shard (positions carry LOCAL tile
            # ids). shard_map keeps the gather purely local — zero ICI
            # traffic; the rest of the step stays auto-sharded DP (XLA
            # inserts the gradient psum).
            P = jax.sharding.PartitionSpec
            imgs, labs = jax.shard_map(
                lambda im, mk, me, st, p, a: gather_batch(
                    im, mk, me, st, p, a, size
                ),
                mesh=self.mesh,
                in_specs=(P("data"), P("data"), P(), P(), P("data"), P("data")),
                out_specs=(P("data"), P("data")),
            )(images, masks, mean, std, positions, aug_ids)
        else:
            imgs, labs = gather_batch(
                images, masks, mean, std, positions, aug_ids, size
            )

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, mutated = self.model.apply(
                variables,
                imgs,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng},
            )
            loss = masked_cross_entropy(logits, labs)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": loss,
            "acc": batch_accuracy(logits, labs),
        }
        if self.cfg.sched.update_type == "balanced_acc":
            # mean per-class recall: imbalance-robust scheduler signal
            # (update_type balanced_acc — round-1 verdict weak #5).
            # Computed + fetched only when the scheduler consumes it —
            # the onehot reduction and the extra per-step scalar
            # round-trip are pure waste otherwise.
            metrics["bacc"] = balanced_batch_accuracy(
                logits, labs, self.cfg.model.num_classes)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, metrics

    def _eval_impl(
        self,
        state: TrainState,
        images: jnp.ndarray,
        masks: jnp.ndarray,
        mean: jnp.ndarray,
        std: jnp.ndarray,
        positions: jnp.ndarray,
        aug_ids: jnp.ndarray,
        *,
        size: int,
    ) -> Dict[str, jnp.ndarray]:
        imgs, labs = gather_batch(
            images, masks, mean, std, positions, aug_ids, size
        )
        # Periodic validation scores the RAW iterate even when EMA is on.
        # Measured (BENCHMARKS.md "Params EMA"): EMA params against the
        # LIVE BatchNorm statistics are a mismatched estimator whose
        # noisy signal BLINDS best-checkpoint selection (the 0.999 runs'
        # best-iters landed at 2300-3000, past the real peak at
        # 800-1200); the EMA weights are evaluated once at the end of
        # training, against BN statistics recalibrated FOR them
        # (recalibrate_batch_stats), where they measure strongest.
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits = self.model.apply(variables, imgs, train=False)
        preds = jnp.argmax(logits, axis=-1)
        return {
            "loss": masked_cross_entropy(logits, labs),
            "acc": batch_accuracy(logits, labs),
            "confusion": confusion_matrix(preds, labs, self.cfg.model.num_classes),
        }

    # ------------------------------------------------------------------ #
    def batch_size_for(self, size: int) -> int:
        """Per-step batch for a bucket; optionally keeps PIXEL count
        constant across scales (SURVEY.md §7 hard part 2), rounded to a
        multiple of the mesh size so the shard is even."""
        b = self.cfg.train.batch_size
        if self.cfg.train.rescale_batch_by_area:
            b = max(8, round(b * (self.scales[0] / size) ** 2))
        n = self.mesh.devices.size
        return max(n, (b // n) * n)

    def make_batch_inputs(self, size: int, augment: Optional[bool] = None,
                          k: int = 1):
        """Host-side sampling of K step-batches -> device-sharded index
        arrays (tiny: K*B*4 int32s per launch). With --shard_tiles each
        device's batch rows are drawn by ITS shard's sampler and carry
        LOCAL tile ids."""
        b = self.batch_size_for(size)
        aug = self.cfg.data.augment if augment is None else augment
        if self.shard_tiles:
            n = self.mesh.devices.size
            bl = b // n  # batch_size_for rounds b to a mesh multiple
            pos = np.empty((k, b, 3), np.int32)
            for d, s in enumerate(self.samplers):
                pos[:, d * bl : (d + 1) * bl] = s.sample(k * bl).reshape(k, bl, 3)
        else:
            pos = self.sampler.sample(k * b).reshape(k, b, 3)
        aug_ids = self.sampler.sample_augment_ids(k * b, aug).reshape(k, b)
        P = jax.sharding.PartitionSpec
        chunk_sharded = jax.sharding.NamedSharding(self.mesh, P(None, "data"))
        pos = jax.device_put(pos, chunk_sharded)
        aug_ids = jax.device_put(aug_ids, chunk_sharded)
        return pos, aug_ids

    def train_step(self, state: TrainState, size: int, dropout_rng: jax.Array):
        """One device launch = cfg.train.steps_per_call optimizer steps."""
        k = self.cfg.train.steps_per_call
        pos, aug_ids = self.make_batch_inputs(size, k=k)
        rngs = jax.random.split(dropout_rng, k)
        return self._train_step(
            state, self.images, self.masks, self.mean, self.std,
            pos, aug_ids, rngs, size=size,
        )

    def eval_crops(
        self,
        state: TrainState,
        tiles_dev: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray],
        positions: np.ndarray,
        size: int,
    ) -> Dict[str, jnp.ndarray]:
        """Crop-based validation on an arbitrary device-resident tile set
        (the reference's periodic validation, SURVEY.md C13/C17)."""
        images, masks, mean, std = tiles_dev
        aug = jnp.zeros((positions.shape[0],), jnp.int32)
        return self._eval_step(
            state, images, masks, mean, std, jnp.asarray(positions), aug, size=size
        )

    def put_tiles(self, tiles: TileSet, pad: Optional[int] = None):
        """Mirror-pad + device-put a tile set for eval_crops."""
        from dynseg.data.tiles import storage_dtype

        p = self.pad if pad is None else pad
        padded = fill_padded_context(mirror_pad(tiles, p), p)
        sd = storage_dtype(padded.images)
        return (
            jax.device_put(padded.images.astype(sd), self.repl),
            jax.device_put(padded.masks.astype(np.uint8), self.repl),
            jax.device_put(padded.mean, self.repl),
            jax.device_put(padded.std, self.repl),
        ), padded

    def recalibrate_batch_stats(self, params: Any, batch_stats: Any,
                                n_batches: int) -> Any:
        """Recompute BatchNorm running statistics FOR the given params —
        the stochastic-weight-averaging companion step, measured decisive
        for the EMA weights (BENCHMARKS.md "Params EMA": the EMA iterate
        against live stats lost 12.7pp vs the raw final on the donor
        cell; against 25 recalibrated batches it WON by 4.7pp). Runs
        n_batches train-mode forwards (params frozen, batch_stats
        mutable) over freshly sampled balanced batches cycling the
        trained scales; BN momentum is 0.9, so ~25-50 batches fully
        refresh. Returns the input unchanged when n_batches <= 0."""
        if n_batches <= 0:
            return batch_stats
        P = jax.sharding.PartitionSpec

        def step(bs, images, masks, mean, std, positions, aug_ids, size):
            if self.shard_tiles:
                imgs, _ = jax.shard_map(
                    lambda im, mk, me, st, p, a: gather_batch(
                        im, mk, me, st, p, a, size
                    ),
                    mesh=self.mesh,
                    in_specs=(P("data"), P("data"), P(), P(),
                              P("data"), P("data")),
                    out_specs=(P("data"), P("data")),
                )(images, masks, mean, std, positions, aug_ids)
            else:
                imgs, _ = gather_batch(
                    images, masks, mean, std, positions, aug_ids, size
                )
            _, mut = self.model.apply(
                {"params": params, "batch_stats": bs},
                imgs, train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(0)},
            )
            return mut["batch_stats"]

        step = jax.jit(step, static_argnames=("size",))
        bs = jax.tree.map(jnp.copy, batch_stats)
        for i in range(n_batches):
            scale = self.scales[i % len(self.scales)]
            pos, aug = self.make_batch_inputs(scale)
            bs = step(bs, self.images, self.masks, self.mean, self.std,
                      pos[0], aug[0], size=scale)
        return bs

    def compile_buckets(self, state: TrainState) -> Dict[int, float]:
        """Pre-compile every per-scale step BEFORE the timed loop so XLA
        never compiles mid-training (SURVEY.md C12 TPU equivalent).
        Returns compile seconds per scale.

        Uses a real warm-up call on a throwaway COPY of the state (the
        caller's state/optimizer/RNG are untouched) rather than AOT
        .lower().compile() — the chipless AOT compile service hangs on
        scan+Pallas programs on the axon remote-TPU platform, while the
        standard jit path compiles them fine."""
        times: Dict[int, float] = {}
        rng = jax.random.key(0)
        for s in self.scales:
            t0 = time.perf_counter()
            k = self.cfg.train.steps_per_call
            b = self.batch_size_for(s)
            P = jax.sharding.PartitionSpec
            chunk_sharded = jax.sharding.NamedSharding(self.mesh, P(None, "data"))
            # Valid dummy positions: tile 0, center (pad, pad). The tile
            # index MUST be in range — the Pallas gather DMAs raw HBM
            # addresses (out-of-range tile ids crash the TPU, unlike
            # XLA's clamping dynamic_slice).
            pos = np.zeros((k, b, 3), np.int32)
            pos[..., 1:] = self.pad
            pos = jax.device_put(pos, chunk_sharded)
            aug = jax.device_put(np.zeros((k, b), np.int32), chunk_sharded)
            rngs = jax.random.split(rng, k)
            scratch = jax.tree.map(jnp.copy, state)  # donated by the call
            _, metrics = self._train_step(
                scratch, self.images, self.masks, self.mean, self.std,
                pos, aug, rngs, size=s,
            )
            jax.block_until_ready(metrics["loss"])
            times[s] = time.perf_counter() - t0
        return times


def train_loop(
    cfg: Config,
    trainer: Trainer,
    state: TrainState,
    scheduler: ScaleScheduler,
    niter: Optional[int] = None,
    log_every: int = 50,
    on_eval=None,
    log=print,
    start_iter: int = 0,
    checkpointer=None,
) -> TrainState:
    """The reference's hot loop ([R] dynamic.py:≈train; SURVEY.md §3.1):
    select scale -> gather+step on device -> update scheduler scores ->
    periodic validation/checkpoint.

    Metric fetches are pipelined `metric_fetch_depth` launches behind
    with copy_to_host_async: a device->host scalar fetch costs a full
    ~28 ms tunnel round-trip, but async copies overlap compute AND each
    other, so the scheduler still gets per-batch feedback (a few batches
    stale — same spirit as the reference's one-step-stale scores) while
    the loop runs at device speed. Measured: 62.7 -> ~12 ms/step at
    steps_per_call=1.

    Preemption safety (beyond the reference's "restart from the last
    periodic save"): when a checkpointer is given, SIGTERM/SIGINT set a
    flag checked once per launch — the loop drains pending scheduler
    scores, checkpoints the exact iteration, and returns cleanly, so a
    maintenance-event eviction loses zero completed steps."""
    import collections
    import signal as _signal

    niter = cfg.train.niter if niter is None else niter
    stop_sig = {"num": None}
    prev_handlers = {}
    if checkpointer is not None:
        def _on_signal(signum, frame):
            stop_sig["num"] = signum

        for s in (_signal.SIGTERM, _signal.SIGINT):
            try:
                prev_handlers[s] = _signal.signal(s, _on_signal)
            except ValueError:  # not the main thread (tests, embedders)
                pass
    k = cfg.train.steps_per_call
    depth = max(1, cfg.train.metric_fetch_depth)
    # fold_in(start_iter): a resumed run must not REPLAY the dropout-key
    # stream from iteration 0 (review r2) — exact continuation of the
    # uninterrupted stream is not reconstructable from a checkpoint, but
    # a distinct stream is the correct fix (the scheduler's own rng IS
    # checkpointed and does continue exactly).
    rng = jax.random.fold_in(jax.random.key(cfg.train.seed + 1), start_iter)
    pending = collections.deque()  # (scale, metrics) with async copies

    def consume_one():
        ps, pm = pending.popleft()
        scheduler.update(ps, float(pm["loss"]), float(pm["acc"]),
                         bacc=float(pm["bacc"]) if "bacc" in pm else None)

    t0 = time.perf_counter()
    patches = 0
    it = start_iter
    # try/finally so the previous signal handlers are restored on EVERY
    # exit path (normal completion, preemption stop, exception).
    try:
        while it < niter:
            if stop_sig["num"] is not None:
                while pending:
                    consume_one()
                checkpointer(it, state, scheduler)
                log(
                    f"signal {stop_sig['num']} received: checkpointed at "
                    f"iteration {it}, stopping (resume with --resume)"
                )
                return state
            scale = scheduler.select()
            rng, dr = jax.random.split(rng)
            state, metrics = trainer.train_step(state, scale, dr)
            prev_it, it = it, it + k
            patches += k * trainer.batch_size_for(scale)

            for m in (metrics["loss"], metrics["acc"], metrics.get("bacc")):
                if m is None:
                    continue
                try:
                    m.copy_to_host_async()
                except AttributeError:  # non-jax array (tests with fakes)
                    pass
            pending.append((scale, metrics))
            while len(pending) > depth:
                consume_one()

            def crossed(every: int) -> bool:
                if every <= 0:  # 0 disables a periodic action (review r2:
                    return False  # --eval_every 0 used to ZeroDivisionError)
                return prev_it // every != it // every

            if crossed(log_every):
                m = {key: float(v) for key, v in metrics.items()}
                dt = time.perf_counter() - t0
                log(
                    f"iter {it}/{niter} scale={scale} loss={m['loss']:.4f} "
                    f"acc={m['acc']:.4f} patches/s={patches / max(dt, 1e-9):.1f} "
                    f"| {scheduler.summary()}"
                )
                t0 = time.perf_counter()
                patches = 0
            if on_eval is not None and crossed(cfg.train.eval_every):
                # Drain pending scores first — cli's on_eval saves the
                # BEST checkpoint with scheduler.state_dict(), which must
                # reflect every completed batch just like the periodic
                # path below (review r2: a best checkpoint could lag the
                # weights by depth*k batches of score updates).
                while pending:
                    consume_one()
                on_eval(it, state)
            if checkpointer is not None and crossed(cfg.train.checkpoint_every):
                # Drain pending scores first so the checkpointed scheduler
                # state reflects every completed batch (resume parity).
                while pending:
                    consume_one()
                checkpointer(it, state, scheduler)
        while pending:
            consume_one()
        return state
    finally:
        for s, h in prev_handlers.items():
            _signal.signal(s, h)
