"""Reproducibility: same seed => identical sampling, scheduling, and
training trajectory (the reference offers no such guarantee; we do)."""

import jax
import numpy as np

from dynseg.config import Config, DataConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.datasets import load_synthetic
from dynseg.data.sampler import BalancedPatchSampler
from dynseg.data.tiles import mirror_pad
from dynseg.sched.scheduler import ScaleScheduler
from dynseg.train import Trainer, train_loop


def _cfg():
    return Config(
        model=ModelConfig(net_type="dilated_grsl", num_classes=2,
                          width_multiplier=0.125),
        sched=SchedulerConfig(distribution_type="multinomial", values=(9, 15)),
        train=TrainConfig(learning_rate=0.05, batch_size=8, niter=6, seed=3),
        data=DataConfig(dataset="synthetic"),
    )


def test_sampler_deterministic(synthetic_data):
    train, _ = synthetic_data
    padded = mirror_pad(train, 8)
    a = BalancedPatchSampler(padded, 2, pad=8, seed=5)
    b = BalancedPatchSampler(padded, 2, pad=8, seed=5)
    np.testing.assert_array_equal(a.sample(32), b.sample(32))
    np.testing.assert_array_equal(
        a.sample_augment_ids(32, True), b.sample_augment_ids(32, True)
    )


def test_training_trajectory_deterministic():
    def run():
        cfg = _cfg()
        tiles, _ = load_synthetic(seed=0, num_tiles=2, size=96)
        tr = Trainer(cfg, tiles)
        state = tr.init_state(jax.random.key(cfg.train.seed))
        sched = ScaleScheduler(cfg.sched, seed=cfg.train.seed)
        state = train_loop(cfg, tr, state, sched, niter=6, log_every=100,
                           log=lambda *_: None)
        return state, sched

    s1, sch1 = run()
    s2, sch2 = run()
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert sch1.state_dict()["scores"] == sch2.state_dict()["scores"]
