"""Serving export (dynseg/export.py): the StableHLO artifact must be
standalone (params + normalization baked), shape-polymorphic (one artifact
for every window scale / dense block), and reproduce the live model
bit-close. Beyond-reference capability — the reference redeploys by
re-running its training script (SURVEY.md C16)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynseg.config import Config, DataConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.export import ARTIFACT, ExportedPredictor, export_predictor
from dynseg.models.dilated import build_model


def _tiny_cfg(**model_kw):
    return Config(
        model=ModelConfig(net_type="dilated_grsl", num_classes=3,
                          num_input_bands=3, width_multiplier=0.125,
                          **model_kw),
        sched=SchedulerConfig(distribution_type="multi_fixed", values=(9, 13)),
        train=TrainConfig(batch_size=4, seed=0),
        data=DataConfig(dataset="synthetic"),
    )


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = _tiny_cfg()
    model = build_model(cfg.model)
    x = jnp.zeros((1, 9, 9, 3), jnp.float32)
    variables = model.init(jax.random.key(3), x, train=False)
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    std = np.array([5.0, 5.0, 5.0], np.float32)
    out = tmp_path_factory.mktemp("export")
    export_predictor(cfg, variables, mean, std, str(out),
                     platforms=("cpu", "tpu"))
    return cfg, model, variables, mean, std, str(out)


def test_export_roundtrip_matches_live_model(exported, rng):
    cfg, model, variables, mean, std, out = exported
    pred = ExportedPredictor.load(out)
    # One artifact serves multiple batch sizes AND window sizes (the nets
    # are fully convolutional — symbolic b/h/w).
    for shape in [(2, 9, 9, 3), (1, 25, 25, 3), (3, 17, 13, 3)]:
        raw = rng.uniform(0, 255, size=shape).astype(np.float32)
        got = pred.probs(raw)
        norm = (jnp.asarray(raw) - mean) / std
        want = jax.nn.softmax(
            model.apply(variables, norm, train=False).astype(jnp.float32), -1
        )
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    labels, probs = pred.predict(raw)
    assert labels.shape == shape[:3] and labels.dtype == np.int32
    np.testing.assert_array_equal(labels, probs.argmax(-1))


def test_export_manifest_and_checksum(exported):
    cfg, _, _, mean, std, out = exported
    pred = ExportedPredictor.load(out)
    m = pred.manifest
    assert m["net_type"] == cfg.model.net_type
    assert m["num_classes"] == cfg.model.num_classes
    assert m["platforms"] == ["cpu", "tpu"]
    np.testing.assert_allclose(m["normalization"]["mean"], mean)
    # a corrupted artifact must be refused
    path = os.path.join(out, ARTIFACT)
    blob = bytearray(open(path, "rb").read())
    blob[len(blob) // 2] ^= 0xFF
    bad = os.path.join(out, "..", "bad_export")
    os.makedirs(bad, exist_ok=True)
    import shutil

    shutil.copy(os.path.join(out, "manifest.json"),
                os.path.join(bad, "manifest.json"))
    with open(os.path.join(bad, ARTIFACT), "wb") as f:
        f.write(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        ExportedPredictor.load(bad)


def test_export_input_validation(exported):
    _, _, _, _, _, out = exported
    pred = ExportedPredictor.load(out)
    with pytest.raises(ValueError, match="expected"):
        pred.probs(np.zeros((1, 9, 9, 5), np.float32))  # wrong band count
    with pytest.raises(ValueError, match="expected"):
        pred.probs(np.zeros((9, 9, 3), np.float32))  # missing batch dim


def test_cli_export_from_checkpoint(tmp_path):
    """--operation export end-to-end: train briefly, export, and the
    artifact must reproduce the restored model's probabilities."""
    from dynseg.checkpoint import CheckpointManager
    from dynseg.cli import build_argparser, config_from_args, run_export, run_training
    from dynseg.sched.scheduler import ScaleScheduler
    from dynseg.train import init_state_template

    args = build_argparser().parse_args([
        "--operation", "training",
        "--dataset", "synthetic",
        "--output_path", str(tmp_path),
        "--net_type", "dilated_grsl",
        "--distribution_type", "single_fixed",
        "--values", "9",
        "--window_batch", "32",
        "--niter", "8",
        "--no_prediction_maps",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, width_multiplier=0.125),
        train=dataclasses.replace(cfg.train, niter=8, batch_size=8,
                                  eval_every=10_000, checkpoint_every=10_000),
    )
    run_training(cfg, log=lambda *_: None)
    out = run_export(cfg, platforms=("cpu",), log=lambda *_: None)
    pred = ExportedPredictor.load(out)
    assert pred.manifest["checkpoint_step"] == 8
    assert pred.manifest["dataset"] == "synthetic"

    # parity vs the restored checkpoint
    ckpt = CheckpointManager(str(tmp_path))
    stats = ckpt.load_stats()
    cfg2 = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, num_input_bands=int(stats["num_input_bands"]),
        num_classes=int(stats["num_classes"])))
    state, _ = ckpt.restore_state(
        init_state_template(cfg2), ScaleScheduler(cfg2.sched, seed=0))
    model = build_model(cfg2.model)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    raw = np.random.default_rng(1).uniform(0, 255, (2, 15, 15, 3)).astype(np.float32)
    norm = (jnp.asarray(raw) - stats["mean"]) / stats["std"]
    want = jax.nn.softmax(
        model.apply(variables, norm, train=False).astype(jnp.float32), -1)
    np.testing.assert_allclose(pred.probs(raw), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # Review r2: export must reconcile scales with the CHECKPOINT — a
    # stale CLI --values (here: defaults 25..65 instead of the trained 9)
    # must not leak into the manifest the server votes with.
    cfg_stale = dataclasses.replace(
        cfg,
        sched=dataclasses.replace(cfg.sched, values=(25, 35, 45, 55, 65)),
        infer=dataclasses.replace(cfg.infer, scales=(25, 35, 45, 55, 65),
                                  scales_explicit=False),
    )
    out2 = run_export(cfg_stale, platforms=("cpu",), log=lambda *_: None)
    m = ExportedPredictor.load(out2).manifest
    assert m["train_scales"] == [9]
    assert m["inference"]["window_scales"] == [9]
    assert m["scheduler_best_scales"] == [9]


def test_bf16_export_roundtrip_matches_live_model(tmp_path, rng):
    """bf16 is the DEFAULT export compute dtype (VERDICT r3 #8 —
    measured accuracy-free + 1.31x on window voting, docs/bf16_eval.json):
    a bfloat16-compute artifact must reproduce the live bf16 model
    bit-close through the full serialize/deserialize round trip, and the
    manifest must record the dtype so operators can audit what serves."""
    cfg = _tiny_cfg(compute_dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dense_halo=0))
    model = build_model(cfg.model)
    x = jnp.zeros((1, 9, 9, 3), jnp.float32)
    variables = model.init(jax.random.key(3), x, train=False)
    mean = np.array([10.0, 20.0, 30.0], np.float32)
    std = np.array([5.0, 5.0, 5.0], np.float32)
    export_predictor(cfg, variables, mean, std, str(tmp_path),
                     platforms=("cpu",))
    pred = ExportedPredictor.load(str(tmp_path))
    assert pred.manifest["compute_dtype"] == "bfloat16"
    # Comparator mirrors export's own composition (normalize -> apply ->
    # f32 softmax) and is JITTED: in bf16, eager vs compiled graphs round
    # at different fusion points, so eager apply() is NOT the ground truth
    # the artifact serializes — the jitted pipeline is.
    @jax.jit
    def live_probs(x):
        x = x.astype(jnp.float32)
        logits = model.apply(variables, (x - mean) / std, train=False)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    for shape in [(2, 9, 9, 3), (1, 25, 25, 3)]:
        raw = rng.uniform(0, 255, size=shape).astype(np.float32)
        got = pred.probs(raw)
        want = live_probs(jnp.asarray(raw))
        np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    # u8 label entry point agrees with the probs entry point in bf16 too
    xu8 = rng.integers(0, 256, size=(1, 12, 14, 3), dtype=np.uint8)
    labels = np.asarray(pred.dense_labels_device(xu8))
    np.testing.assert_array_equal(labels[0], pred.probs(xu8)[0].argmax(-1))


def test_export_compute_dtype_cli_default():
    """--operation export defaults to bfloat16 compute; training and
    quantized exports stay float32; an explicit flag always wins."""
    from dynseg.cli import build_argparser, config_from_args

    def cfg_for(argv):
        return config_from_args(build_argparser().parse_args(argv))

    base = ["--dataset", "synthetic", "--output_path", "/tmp/x"]
    assert cfg_for(["--operation", "export"] + base
                   ).model.compute_dtype == "bfloat16"
    assert cfg_for(["--operation", "training"] + base
                   ).model.compute_dtype == "float32"
    assert cfg_for(["--operation", "validate_test"] + base
                   ).model.compute_dtype == "float32"
    assert cfg_for(["--operation", "export", "--quant", "int8"] + base
                   ).model.compute_dtype == "float32"
    assert cfg_for(["--operation", "export", "--compute_dtype", "float32"]
                   + base).model.compute_dtype == "float32"
    assert cfg_for(["--operation", "training", "--compute_dtype", "bfloat16"]
                   + base).model.compute_dtype == "bfloat16"


def test_export_with_zero_halo(tmp_path, rng):
    """dense_halo=0 must export a dense_labels entry that returns the
    FULL label map (the [0:-0] empty-slice trap)."""
    import dataclasses

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dense_halo=0))
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(7),
                           jnp.zeros((1, 9, 9, 3), jnp.float32), train=False)
    export_predictor(cfg, variables, np.zeros(3, np.float32),
                     np.ones(3, np.float32), str(tmp_path),
                     platforms=("cpu",))
    pred = ExportedPredictor.load(str(tmp_path))
    x = rng.integers(0, 256, size=(1, 12, 14, 3), dtype=np.uint8)
    labels = np.asarray(pred.dense_labels_device(x))
    assert labels.shape == (1, 12, 14)
    np.testing.assert_array_equal(labels[0], pred.probs(x)[0].argmax(-1))


def test_export_bakes_recalibrated_ema_weights(tmp_path):
    """--operation export on an EMA checkpoint must bake the EMA params
    WITH their recalibrated BatchNorm statistics (the shipped serving
    recipe) — the artifact's probs must match the live EMA+recal model,
    and must NOT match the raw final iterate."""
    import flax.serialization

    from dynseg.checkpoint import CheckpointManager
    from dynseg.cli import (_serving_variables, build_argparser,
                            config_from_args, run_export, run_training)
    from dynseg.sched.scheduler import ScaleScheduler
    from dynseg.train import init_state_template

    args = build_argparser().parse_args([
        "--operation", "training",
        "--dataset", "synthetic",
        "--output_path", str(tmp_path),
        "--net_type", "dilated_grsl",
        "--distribution_type", "single_fixed",
        "--values", "9",
        "--window_batch", "32",
        "--niter", "8",
        "--ema_decay", "0.9",
        "--ema_recalib_batches", "4",
        "--no_prediction_maps",
        "--compute_dtype", "float32",  # exact live comparison
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, width_multiplier=0.125),
        train=dataclasses.replace(cfg.train, niter=8, batch_size=8,
                                  eval_every=10_000, checkpoint_every=10_000),
    )
    run_training(cfg, log=lambda *_: None)
    out = run_export(cfg, platforms=("cpu",), log=lambda *_: None)
    pred = ExportedPredictor.load(out)

    ckpt = CheckpointManager(str(tmp_path))
    stats = ckpt.load_stats()
    assert "ema_batch_stats" in stats
    from dynseg.cli import _adopt_checkpoint_model

    tcfg = _adopt_checkpoint_model(cfg, stats)
    state, _ = ckpt.restore_state(init_state_template(tcfg),
                                  ScaleScheduler(tcfg.sched, seed=0))
    mean = np.asarray(stats["mean"], np.float32)
    std = np.asarray(stats["std"], np.float32)
    model = build_model(tcfg.model)

    def live(variables, raw):
        logits = model.apply(variables, (raw - mean) / std, train=False)
        return np.asarray(jax.nn.softmax(logits, axis=-1))

    rng = np.random.default_rng(0)
    raw = rng.uniform(0, 255, size=(2, 12, 12, 3)).astype(np.float32)
    got = pred.probs(raw)
    ema_vars = _serving_variables(tcfg, state, stats, None,
                                  log=lambda *_: None)
    np.testing.assert_allclose(got, live(ema_vars, raw),
                               atol=1e-5, rtol=1e-5)
    raw_vars = {"params": state.params, "batch_stats": state.batch_stats}
    assert not np.allclose(got, live(raw_vars, raw), atol=1e-5)


def test_serving_variables_use_best_auto_resolves_raw():
    """ADVICE r4: with --use_best on an EMA-trained checkpoint, auto
    (use_ema=None) must serve the RAW best iterate — best-step selection
    was scored on raw weights and the sidecar's recalibrated BN stats
    belong to the end-of-training EMA. Explicit use_ema=True still opts
    into the approximate combination."""
    import dataclasses
    from types import SimpleNamespace

    from dynseg.cli import _serving_variables
    from dynseg.config import Config

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, ema_decay=0.999))
    raw = {"w": np.ones((2,))}
    ema = {"w": np.full((2,), 2.0)}
    bs = {"bn": {"mean": np.zeros((2,))}}
    state = SimpleNamespace(params=raw, batch_stats=bs,
                            opt_state=(SimpleNamespace(ema=ema),))

    got = _serving_variables(cfg, state, {}, None, log=lambda *_: None,
                             from_best=True)
    assert got["params"] is raw  # auto -> raw for best restores
    got = _serving_variables(cfg, state, {}, None, log=lambda *_: None,
                             from_best=False)
    assert got["params"] is ema  # auto -> EMA for latest restores
    got = _serving_variables(cfg, state, {}, True, log=lambda *_: None,
                             from_best=True)
    assert got["params"] is ema  # explicit opt-in still works
