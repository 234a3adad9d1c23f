"""Training-engine tests: loss decreases, weight-decay masking, bucketed
multi-scale steps share one parameter set, and the DP path runs sharded
over the 8 virtual devices (SURVEY.md §4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dynseg.config import Config, DataConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.datasets import load_synthetic
from dynseg.sched.scheduler import ScaleScheduler
from dynseg.train import Trainer, make_optimizer, masked_cross_entropy, train_loop


def tiny_config(**overrides) -> Config:
    base = Config(
        model=ModelConfig(
            net_type="dilated_grsl", num_classes=2, num_input_bands=3,
            width_multiplier=0.125,
        ),
        sched=SchedulerConfig(distribution_type="multi_fixed", values=(9, 15)),
        train=TrainConfig(
            learning_rate=0.05, weight_decay=5e-4, batch_size=16,
            niter=30, eval_every=1000, checkpoint_every=1000, seed=0,
        ),
        data=DataConfig(dataset="synthetic"),
    )
    return dataclasses.replace(base, **overrides) if overrides else base


@pytest.fixture(scope="module")
def tiles():
    return load_synthetic(seed=0, num_tiles=2, size=96)


def test_masked_ce_ignores_padding():
    logits = jnp.zeros((1, 1, 2, 3))
    labels = jnp.array([[[0, 255]]])
    # only the valid pixel contributes: CE = log(3)
    np.testing.assert_allclose(
        float(masked_cross_entropy(logits, labels)), np.log(3), rtol=1e-4
    )


def test_weight_decay_only_on_kernels(tiles):
    cfg = tiny_config()
    tx = make_optimizer(cfg)
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    # Randomize params first: biases/BN init to ZERO, so decay*0 == 0 and
    # the negative assertion below was vacuous on fresh init (review r2,
    # round 2 — a mask that wrongly decayed biases still passed).
    keys = iter(jax.random.split(jax.random.key(7), 1000))
    params = jax.tree.map(
        lambda p: jax.random.normal(next(keys), p.shape, p.dtype), state.params)
    zeros = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(zeros, tx.init(params), params)
    flat = jax.tree_util.tree_flatten_with_path(updates)[0]
    for path, u in flat:
        keys = [getattr(p, "key", "") for p in path]
        if "kernel" in keys:
            assert float(jnp.abs(u).max()) > 0, keys  # decayed
        else:
            assert float(jnp.abs(u).max()) == 0, keys  # bias/BN untouched


def test_loss_decreases_and_buckets_share_params(tiles):
    cfg = tiny_config()
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    sched = ScaleScheduler(cfg.sched, seed=0)
    rng = jax.random.key(1)

    losses = []
    for it in range(30):
        scale = sched.select()  # alternates 9 / 15 — both buckets exercised
        rng, dr = jax.random.split(rng)
        state, m = trainer.train_step(state, scale, dr)
        losses.append(float(m["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.8, losses
    assert int(state.step) == 30


def test_train_loop_updates_scheduler(tiles):
    cfg = tiny_config()
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    sched = ScaleScheduler(
        dataclasses.replace(cfg.sched, distribution_type="multinomial"), seed=0
    )
    state = train_loop(cfg, trainer, state, sched, niter=8, log_every=100, log=lambda *_: None)
    st = sched.state_dict()
    assert any(v is not None for v in st["scores"].values())
    assert int(state.step) == 8


def test_dp_sharded_training_runs(tiles):
    n = jax.device_count()
    assert n == 8, "conftest must provide 8 virtual CPU devices"
    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=16, niter=4, num_devices=8, seed=0,
    ))
    trainer = Trainer(cfg, tiles[0])
    assert trainer.mesh.devices.size == 8
    state = trainer.init_state(jax.random.key(0))
    rng = jax.random.key(1)
    for _ in range(3):
        rng, dr = jax.random.split(rng)
        state, m = trainer.train_step(state, 9, dr)
    assert np.isfinite(float(m["loss"]))
    # params replicated: addressable on every device
    p0 = jax.tree.leaves(state.params)[0]
    assert p0.sharding.is_fully_replicated


def test_shard_tiles_training_runs_and_learns():
    """--shard_tiles: tile axis sharded over the 8-device mesh, per-device
    local sampling/gather via shard_map; training must run and reduce
    loss, with params replicated."""
    n = jax.device_count()
    assert n == 8
    train_tiles, _ = load_synthetic(seed=0, num_tiles=16, size=64)
    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=32, niter=30, num_devices=8, seed=0,
        shard_tiles=True,
    ))
    trainer = Trainer(cfg, train_tiles)
    assert trainer.shard_tiles and len(trainer.samplers) == 8
    assert trainer.images.shape[0] == 16  # 2 tiles per device
    assert not trainer.images.sharding.is_fully_replicated
    state = trainer.init_state(jax.random.key(0))
    rng = jax.random.key(1)
    losses = []
    for _ in range(30):
        rng, dr = jax.random.split(rng)
        state, m = trainer.train_step(state, 9, dr)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert jax.tree.leaves(state.params)[0].sharding.is_fully_replicated


def test_shard_tiles_gather_matches_global(tiles):
    """The sharded gather must return exactly the patches that direct
    global-id gathering from the full tile set would return."""
    from dynseg.ops.gather import gather_batch

    train_tiles, _ = load_synthetic(seed=3, num_tiles=8, size=48)
    cfg = tiny_config(train=TrainConfig(batch_size=16, num_devices=8, seed=0,
                                        shard_tiles=True))
    tr = Trainer(cfg, train_tiles)
    tpd = tr.tiles_per_device
    pos, aug = tr.make_batch_inputs(9, k=1)
    pos_np, aug_np = np.asarray(pos), np.asarray(aug)

    state = tr.init_state(jax.random.key(0))
    _, _ = tr.train_step(state, 9, jax.random.key(1))  # compiles the path

    # direct: reconstruct GLOBAL ids (local id + device_block * tpd)
    n = 8
    bl = pos_np.shape[1] // n
    gpos = pos_np[0].copy()
    for d in range(n):
        gpos[d * bl : (d + 1) * bl, 0] += d * tpd
    imgs_ref, labs_ref = gather_batch(
        jnp.asarray(np.asarray(tr.images)), jnp.asarray(np.asarray(tr.masks)),
        tr.mean, tr.std, jnp.asarray(gpos), jnp.asarray(aug_np[0]), 9,
    )

    # sharded path: call the step's gather in isolation via shard_map
    P = jax.sharding.PartitionSpec
    sh = jax.shard_map(
        lambda im, mk, me, st, p, a: gather_batch(im, mk, me, st, p, a, 9),
        mesh=tr.mesh,
        in_specs=(P("data"), P("data"), P(), P(), P("data"), P("data")),
        out_specs=(P("data"), P("data")),
    )
    imgs_sh, labs_sh = sh(tr.images, tr.masks, tr.mean, tr.std,
                          jnp.asarray(pos_np[0]), jnp.asarray(aug_np[0]))
    np.testing.assert_allclose(np.asarray(imgs_sh), np.asarray(imgs_ref),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(labs_sh), np.asarray(labs_ref))


def test_batch_rescaling_by_area(tiles):
    cfg = tiny_config(train=TrainConfig(batch_size=64, rescale_batch_by_area=True))
    trainer = Trainer(cfg, tiles[0])
    b9 = trainer.batch_size_for(9)
    b15 = trainer.batch_size_for(15)
    assert b9 == 64 and b15 < b9
    assert abs(b15 * 15 * 15 - b9 * 9 * 9) / (b9 * 81) < 0.35  # ~const pixels


def test_chunked_steps_per_call(tiles):
    """steps_per_call=K runs K optimizer steps per launch (lax.scan) and
    reports chunk-mean metrics."""
    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=12, seed=0, steps_per_call=4,
    ))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    state, m = trainer.train_step(state, 9, jax.random.key(1))
    assert int(state.step) == 4
    assert m["loss"].shape == ()
    sched = ScaleScheduler(cfg.sched, seed=0)
    state = trainer.init_state(jax.random.key(2))
    state = train_loop(cfg, trainer, state, sched, niter=12,
                       log_every=100, log=lambda *_: None)
    assert int(state.step) == 12


def test_compile_buckets_does_not_mutate_state(tiles):
    cfg = tiny_config()
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    times = trainer.compile_buckets(state)
    assert set(times) == {9, 15}
    after = jax.tree.leaves(state.params)
    for a, b in zip(jax.tree.leaves(before), after):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_sigterm_checkpoints_and_stops(tiles, tmp_path):
    """Preemption safety: SIGTERM mid-loop must drain scheduler scores,
    checkpoint the current iteration, and return cleanly."""
    import signal
    import threading

    from dynseg.checkpoint import CheckpointManager

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, niter=100_000, checkpoint_every=10_000_000,
            output_path=str(tmp_path)),
    )
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    sched = ScaleScheduler(cfg.sched, seed=0)
    ckpt = CheckpointManager(str(tmp_path))
    logs = []

    prev_handler = signal.getsignal(signal.SIGTERM)
    timer = threading.Timer(1.0, signal.raise_signal, (signal.SIGTERM,))
    timer.start()
    try:
        state = train_loop(
            cfg, trainer, state, sched, log_every=10_000_000,
            log=logs.append,
            checkpointer=lambda it, st, sc: ckpt.save(it, st, sc),
        )
    finally:
        timer.cancel()
    it = int(state.step)
    assert 0 < it < cfg.train.niter  # stopped early, made progress
    assert ckpt.latest_step() == it  # checkpointed exactly where it stopped
    assert any("signal" in m for m in logs)
    # handler restored to whatever was installed BEFORE train_loop
    # (review r2: asserting SIG_DFL specifically broke under harnesses
    # with their own SIGTERM handler and could not distinguish
    # restore-previous from blind reset)
    assert signal.getsignal(signal.SIGTERM) == prev_handler


def test_keep_best_checkpoint_roundtrip(tiles, tmp_path):
    """save_best keeps only the top-metric checkpoint; restore_state
    (best=True) returns it even after later (worse) evals and later
    periodic saves."""
    from dynseg.checkpoint import CheckpointManager

    cfg = tiny_config()
    trainer = Trainer(cfg, tiles[0])
    sched = ScaleScheduler(cfg.sched, seed=0)
    ckpt = CheckpointManager(str(tmp_path))

    s1 = trainer.init_state(jax.random.key(1))
    s2 = trainer.init_state(jax.random.key(2))
    s3 = trainer.init_state(jax.random.key(3))

    assert ckpt.save_best(0.50, 10, s1, sched)
    assert not ckpt.save_best(0.40, 20, s2, sched)  # worse: kept out
    assert ckpt.save_best(0.70, 30, s3, sched)
    ckpt.save(40, s2, sched)  # a later periodic save must not shadow best

    rec = ckpt.best_record()
    assert rec == {"metric": 0.70, "step": 30}
    restored, step = ckpt.restore_state(
        trainer.init_state(jax.random.key(0)), best=True)
    assert step == 30
    l3 = jax.tree_util.tree_leaves(s3.params)[0]
    lr = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(l3), np.asarray(lr))
    # latest (non-best) restore still returns the periodic save
    _, step_latest = ckpt.restore_state(trainer.init_state(jax.random.key(0)))
    assert step_latest == 40


def test_save_best_refuses_stale_step(tiles, tmp_path):
    """orbax silently skips saves at steps <= the latest best step; the
    best.json record must never claim weights that were not written."""
    from dynseg.checkpoint import CheckpointManager

    cfg = tiny_config()
    trainer = Trainer(cfg, tiles[0])
    sched = ScaleScheduler(cfg.sched, seed=0)
    ckpt = CheckpointManager(str(tmp_path))
    s30 = trainer.init_state(jax.random.key(1))
    assert ckpt.save_best(0.5, 30, s30, sched)
    # fresh run in the same output dir evaluates at an EARLIER step with a
    # better metric: orbax refuses step 10 <= 30 — record must not change
    ckpt2 = CheckpointManager(str(tmp_path))
    s10 = trainer.init_state(jax.random.key(2))
    assert not ckpt2.save_best(0.9, 10, s10, sched)
    assert ckpt2.best_record() == {"metric": 0.5, "step": 30}
    restored, step = ckpt2.restore_state(
        trainer.init_state(jax.random.key(0)), best=True)
    assert step == 30


def test_dp_checkpoint_save_restore_roundtrip(tiles, tmp_path):
    """Multi-chip resume: checkpointing DP-sharded state and restoring it
    into a fresh mesh trainer must reproduce params bit-for-bit and
    continue training."""
    from dynseg.checkpoint import CheckpointManager

    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=16, niter=4, num_devices=8, seed=0,
        output_path=str(tmp_path),
    ))
    trainer = Trainer(cfg, tiles[0])
    sched = ScaleScheduler(cfg.sched, seed=0)
    state = trainer.init_state(jax.random.key(0))
    rng = jax.random.key(1)
    for _ in range(3):
        rng, dr = jax.random.split(rng)
        state, _ = trainer.train_step(state, 9, dr)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(3, state, sched)

    trainer2 = Trainer(cfg, tiles[0])  # fresh mesh + buckets
    restored, step = ckpt.restore(trainer2, ScaleScheduler(cfg.sched, seed=0))
    assert step == 3
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state must be usable for further sharded steps
    restored, m = trainer2.train_step(restored, 9, jax.random.key(2))
    assert np.isfinite(float(m["loss"]))


def test_shard_tiles_uneven_count_interleaves_dummies():
    """An uneven tile count (2n+1 over n devices) pads with all-IGNORE
    dummy tiles; those must SPREAD across device shards (round-robin
    interleave) — appended in place they fill whole trailing shards and
    the sampler rejects the unlabeled device (round-1 dryrun regression)."""
    n = jax.device_count()
    train_tiles, _ = load_synthetic(seed=1, num_tiles=2 * n + 1, size=48)
    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=2 * n, niter=4, num_devices=n,
        seed=0, shard_tiles=True,
    ))
    trainer = Trainer(cfg, train_tiles)  # must not raise
    assert trainer.images.shape[0] == 3 * n  # padded to a multiple
    # every device shard retains at least one labeled (real) tile
    masks = np.asarray(trainer.masks)
    tpd = trainer.tiles_per_device
    for d in range(n):
        shard = masks[d * tpd:(d + 1) * tpd]
        assert (shard != 255).any(), f"device {d} shard all-IGNORE"
    state = trainer.init_state(jax.random.key(0))
    state, m = trainer.train_step(state, 9, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))


def test_periodic_every_zero_disables(tiles):
    """review r2 (round 2): --eval_every 0 / --checkpoint_every 0 /
    log_every=0 used to ZeroDivisionError on the first loop iteration
    (after minutes of bucket compiles on a real run); 0 now means
    'disabled' for every periodic action."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, eval_every=0, checkpoint_every=0, niter=4))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    sched = ScaleScheduler(cfg.sched)
    fired = []
    train_loop(cfg, trainer, state, sched, niter=4, log_every=0,
               on_eval=lambda it, st: fired.append(("eval", it)),
               checkpointer=lambda *a: fired.append(("ckpt",)),
               log=lambda *_: None)
    assert fired == []


def test_on_eval_sees_drained_scheduler_scores(tiles):
    """review r2 (round 2): with metric_fetch_depth > 1 the eval callback
    (which saves the BEST checkpoint incl. scheduler.state_dict()) could
    observe a scheduler lagging the weights by depth*k batches of score
    updates; the loop now drains pending metrics before on_eval, same as
    the periodic-checkpoint path."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, eval_every=3, niter=9, metric_fetch_depth=4))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))

    class CountingScheduler(ScaleScheduler):
        n_select = 0
        n_update = 0

        def select(self):
            type(self).n_select += 1
            return super().select()

        def update(self, *a, **kw):
            type(self).n_update += 1
            return super().update(*a, **kw)

    sched = CountingScheduler(cfg.sched)
    seen = []
    train_loop(cfg, trainer, state, sched, niter=9, log_every=100,
               on_eval=lambda it, st: seen.append(
                   (CountingScheduler.n_select, CountingScheduler.n_update)),
               log=lambda *_: None)
    assert seen, "eval_every=3 over 9 iters must fire"
    for n_sel, n_upd in seen:
        assert n_upd == n_sel, (
            f"on_eval observed {n_sel - n_upd} undrained score updates")


def test_num_devices_mismatch_raises_value_error(tiles):
    """review r2 (round 2): was a bare assert (vanishes under python -O,
    silently training on fewer chips than requested)."""
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, num_devices=99))
    with pytest.raises(ValueError, match="99"):
        Trainer(cfg, tiles[0])


# --------------------------------------------------------------------- #
# Params-EMA (--ema_decay): the r4 "final-iterate lottery" mitigation.
# Tracked inside opt_state (train.track_ema) so the checkpoint layout is
# unchanged when off — orbax refuses to restore a tree whose structure
# changed even by a None leaf, so a new TrainState field would have
# broken every pre-EMA checkpoint.
# --------------------------------------------------------------------- #
def test_ema_recurrence_matches_numpy(tiles):
    """ema_t = d*ema_{t-1} + (1-d)*params_t, warm-started at params_0 —
    checked leaf-exactly against a host-side recurrence over the actual
    per-step params."""
    from dynseg.train import ema_params

    d = 0.5
    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=4, seed=0, ema_decay=d,
    ))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))

    def leaf(tree):
        return np.asarray(jax.tree_util.tree_leaves(tree)[0], np.float64)

    expect = leaf(state.params)  # warm start: ema_0 = params_0
    np.testing.assert_array_equal(leaf(ema_params(cfg, state)),
                                  expect.astype(np.float32))
    rng = jax.random.key(1)
    for _ in range(4):
        rng, dr = jax.random.split(rng)
        state, _ = trainer.train_step(state, 9, dr)
        expect = d * expect + (1 - d) * leaf(state.params)
        np.testing.assert_allclose(
            leaf(ema_params(cfg, state)), expect, rtol=1e-5, atol=1e-7)


def test_ema_chunked_steps_match_recurrence(tiles):
    """steps_per_call=K applies the EMA update per OPTIMIZER STEP inside
    the scanned chunk, not once per launch."""
    from dynseg.train import ema_params

    d = 0.9
    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=4, seed=0,
        steps_per_call=4, ema_decay=d,
    ))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    p0 = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    state, _ = trainer.train_step(state, 9, jax.random.key(1))
    assert int(state.step) == 4
    ema = np.asarray(jax.tree_util.tree_leaves(ema_params(cfg, state))[0])
    pK = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
    # 4 distinct EMA applications: the result lies strictly between the
    # warm start and the final params, and is NOT a single-step blend of
    # them (which is what a once-per-launch update would produce).
    one_step = d * p0 + (1 - d) * pK
    assert not np.allclose(ema, one_step, rtol=1e-6)
    assert not np.allclose(ema, pK, rtol=1e-6)
    assert not np.allclose(ema, p0, rtol=1e-6)


def test_ema_checkpoint_roundtrip_and_layout_guard(tiles, tmp_path):
    """EMA weights ride in opt_state through save/restore bit-exactly;
    an ema-on template cannot restore an ema-off checkpoint (the CLI
    resume guard exists because orbax refuses the layout change)."""
    from dynseg.checkpoint import CheckpointManager
    from dynseg.train import ema_params

    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=4, seed=0, ema_decay=0.9,
    ))
    trainer = Trainer(cfg, tiles[0])
    sched = ScaleScheduler(cfg.sched, seed=0)
    state = trainer.init_state(jax.random.key(0))
    state, _ = trainer.train_step(state, 9, jax.random.key(1))
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, state, sched)
    restored, step = ckpt.restore_state(trainer.init_state(jax.random.key(7)))
    for a, b in zip(jax.tree_util.tree_leaves(ema_params(cfg, state)),
                    jax.tree_util.tree_leaves(ema_params(cfg, restored))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # ema and raw params genuinely differ after a step
    assert not np.allclose(
        np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(ema_params(cfg, restored))[0]))

    # ema-OFF checkpoint + ema-ON template: orbax must refuse (layout)
    off = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=4, seed=0))
    t_off = Trainer(off, tiles[0])
    ckpt2 = CheckpointManager(str(tmp_path / "off"))
    ckpt2.save(1, t_off.init_state(jax.random.key(0)), sched)
    with pytest.raises(Exception):
        ckpt2.restore_state(trainer.init_state(jax.random.key(0)))


def test_ema_off_keeps_opt_state_layout(tiles):
    """ema_decay=0 must leave the optax chain — and therefore every
    pre-EMA checkpoint's on-disk layout — exactly as before."""
    from dynseg.train import ema_params

    cfg = tiny_config()
    assert cfg.train.ema_decay == 0.0
    tx_state = make_optimizer(cfg).init(
        {"w": jnp.ones((2,))})
    assert len(tx_state) == 2  # (add_decayed_weights, sgd) — no tracker
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    assert ema_params(cfg, state) is None


def test_ema_eval_scores_raw_iterate(tiles):
    """Periodic validation scores the RAW iterate even when EMA is on
    (measured: EMA-vs-live-BN is a mismatched estimator whose noisy
    signal blinds keep_best — BENCHMARKS.md "Params EMA"): splicing a
    frozen EMA into the state must not change eval metrics."""
    from dynseg.train import EmaParamsState

    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=4, seed=0, ema_decay=0.9,
    ))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    init_params = jax.tree.map(jnp.copy, state.params)
    rng = jax.random.key(1)
    for _ in range(6):
        rng, dr = jax.random.split(rng)
        state, _ = trainer.train_step(state, 9, dr)

    dev, padded = trainer.put_tiles(tiles[0])
    from dynseg.data.sampler import BalancedPatchSampler
    pos = BalancedPatchSampler(padded, 2, pad=trainer.pad, seed=3,
                               balanced=False).sample(16)
    m_real = trainer.eval_crops(state, dev, pos, 9)
    frozen = state.replace(opt_state=tuple(state.opt_state[:-1]) + (
        EmaParamsState(ema=init_params),))
    m_frozen = trainer.eval_crops(frozen, dev, pos, 9)
    np.testing.assert_allclose(float(m_frozen["loss"]),
                               float(m_real["loss"]), rtol=1e-6)


def test_recalibrate_batch_stats(tiles):
    """BN recalibration (the SWA companion step): refreshes the running
    statistics for given params, is deterministic, and n=0 is a no-op."""
    from dynseg.train import ema_params

    cfg = tiny_config(train=TrainConfig(
        learning_rate=0.05, batch_size=8, niter=4, seed=0, ema_decay=0.9,
    ))
    trainer = Trainer(cfg, tiles[0])
    state = trainer.init_state(jax.random.key(0))
    rng = jax.random.key(1)
    for _ in range(4):
        rng, dr = jax.random.split(rng)
        state, _ = trainer.train_step(state, 9, dr)
    ema = ema_params(cfg, state)

    same = trainer.recalibrate_batch_stats(ema, state.batch_stats, 0)
    for a, b in zip(jax.tree.leaves(same), jax.tree.leaves(state.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rec = trainer.recalibrate_batch_stats(ema, state.batch_stats, 6)
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(rec),
                             jax.tree.leaves(state.batch_stats))]
    assert max(diffs) > 0, "recalibration changed nothing"
    # deterministic: the sampler streams are consumed, so rebuild the
    # trainer to replay the same positions
    trainer2 = Trainer(cfg, tiles[0])
    rec2 = trainer2.recalibrate_batch_stats(ema, state.batch_stats, 6)
    # trainer2's sampler starts fresh while trainer's was advanced by
    # training -> recalibration itself must still produce FINITE, valid
    # stats (exact equality is not expected across different position
    # streams; shapes/dtypes must match)
    for a, b in zip(jax.tree.leaves(rec), jax.tree.leaves(rec2)):
        assert np.asarray(a).shape == np.asarray(b).shape
        assert np.all(np.isfinite(np.asarray(a)))
