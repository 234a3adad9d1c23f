"""CLI surface tests: the reference-compatible flags parse into the
expected Config (SURVEY.md C1) — regression fence for the public API."""

import pytest

from dynseg.cli import build_argparser, config_from_args, parse_values


def _cfg(extra):
    args = build_argparser().parse_args(["--operation", "training"] + extra)
    return config_from_args(args)


def test_reference_flags_roundtrip():
    cfg = _cfg([
        "--dataset", "vaihingen", "--dataset_path", "/data/v",
        "--net_type", "dilated_grsl_rate8", "--learning_rate", "0.02",
        "--weight_decay", "1e-3", "--batch_size", "64", "--niter", "1234",
        "--distribution_type", "uniform", "--values", "25,45,65",
        "--update_type", "loss", "--fold", "3",
    ])
    assert cfg.data.dataset == "vaihingen" and cfg.data.fold == 3
    assert cfg.model.net_type == "dilated_grsl_rate8"
    assert cfg.model.num_classes == 6  # from dataset table
    assert cfg.train.learning_rate == 0.02
    assert cfg.train.weight_decay == 1e-3
    assert cfg.train.batch_size == 64 and cfg.train.niter == 1234
    assert cfg.sched.distribution_type == "uniform"
    assert tuple(cfg.sched.values) == (25, 45, 65)
    assert cfg.sched.update_type == "loss"
    assert tuple(cfg.infer.scales) == (25, 45, 65)  # default = train values


def test_new_framework_flags():
    cfg = _cfg([
        "--steps_per_call", "8", "--num_devices", "4",
        "--compute_dtype", "bfloat16", "--rescale_batch_by_area",
        "--inference_mode", "dense", "--dense_block", "512",
        "--dense_halo", "48", "--test_scales", "35,55",
        "--no_augment", "--no_balanced_sampling",
    ])
    assert cfg.train.steps_per_call == 8
    assert cfg.train.num_devices == 4
    assert cfg.model.compute_dtype == "bfloat16"
    assert cfg.train.rescale_batch_by_area
    assert cfg.infer.mode == "dense"
    assert cfg.infer.dense_block == 512 and cfg.infer.dense_halo == 48
    assert tuple(cfg.infer.scales) == (35, 55)
    assert not cfg.data.augment and not cfg.data.balanced_sampling


def test_session2_flags_roundtrip():
    cfg = _cfg([
        "--scan_chunk", "16", "--dense_scan_chunk", "2",
        "--metric_fetch_depth", "4", "--shard_tiles",
        "--num_devices", "2", "--hbm_budget_gb", "2.5",
    ])
    assert cfg.infer.scan_chunk == 16
    assert cfg.infer.dense_scan_chunk == 2
    assert cfg.train.metric_fetch_depth == 4
    assert cfg.train.shard_tiles
    assert cfg.infer.hbm_budget_gb == 2.5
    # sharding the tile axis needs a mesh to shard over
    with pytest.raises(ValueError, match="shard_tiles"):
        _cfg(["--shard_tiles"])


def test_predict_operation_flags():
    args = build_argparser().parse_args(
        ["--operation", "predict", "--predict_path", "/data/new"])
    assert args.operation == "predict" and args.predict_path == "/data/new"


def test_parse_values():
    assert parse_values("25,35, 45") == [25, 35, 45]
    assert parse_values([25, 35]) == [25, 35]
    with pytest.raises(ValueError):
        parse_values("abc")


def test_operation_synonyms():
    for op in ("testing", "validate_test"):
        args = build_argparser().parse_args(["--operation", op])
        assert args.operation == op


def test_invalid_choices_rejected():
    for bad in (["--dataset", "nope"], ["--net_type", "resnet"],
                ["--distribution_type", "zipf"]):
        with pytest.raises(SystemExit):
            build_argparser().parse_args(["--operation", "training"] + bad)


@pytest.mark.parametrize("flags,match", [
    (["--batch_size", "0"], "batch_size"),
    (["--values", "25,-3"], "patch sizes"),
    (["--steps_per_call", "0"], "steps_per_call"),
    (["--stride_fraction", "0"], "stride_fraction"),
    (["--window_batch", "0"], "window_batch"),
    (["--num_devices", "0"], "num_devices"),
    (["--eval_eroded_boundaries", "-1"], "eval_eroded"),
    (["--sched_ema", "1.5"], "sched_ema"),
    (["--sched_temperature", "0"], "sched_temperature"),
    (["--extra_bands", "dsm,nsdm"], "extra_bands"),
])
def test_config_validation_messages(flags, match):
    """validate() raises ValueError with an actionable message (bare
    asserts would vanish under python -O)."""
    with pytest.raises(ValueError, match=match):
        _cfg(flags)


def test_test_scales_explicit_flag():
    assert not _cfg([]).infer.scales_explicit
    assert _cfg(["--test_scales", "35,55"]).infer.scales_explicit


def _restored_scheduler(cfg_values, ckpt_values):
    """Scheduler built from CLI values, then restored from a checkpoint
    trained at ckpt_values (load_state_dict adopts the checkpoint's)."""
    from dynseg.config import SchedulerConfig
    from dynseg.sched.scheduler import ScaleScheduler

    donor = ScaleScheduler(SchedulerConfig(values=tuple(ckpt_values)), seed=0)
    for v in ckpt_values:
        donor.update(v, loss=1.0, acc=0.5)
    sch = ScaleScheduler(SchedulerConfig(values=tuple(cfg_values)), seed=0)
    sch.load_state_dict(donor.state_dict())
    return sch


def test_reconcile_scales_adopts_checkpoint_when_implicit():
    """VERDICT r1 #7: stale default --values + checkpoint trained at other
    scales must not silently vote at untrained scales."""
    from dynseg.cli import _reconcile_scales

    cfg = _cfg([])  # default scales 25,35,45,55,65, not explicit
    sch = _restored_scheduler(cfg.sched.values, [9, 13])
    msgs = []
    out = _reconcile_scales(cfg, sch, msgs.append)
    assert tuple(out.infer.scales) == (9, 13)
    assert any("WARNING" in m for m in msgs)


def test_reconcile_scales_honors_explicit_test_scales():
    from dynseg.cli import _reconcile_scales

    cfg = _cfg(["--test_scales", "25,45"])
    sch = _restored_scheduler(cfg.sched.values, [9, 13])
    msgs = []
    out = _reconcile_scales(cfg, sch, msgs.append)
    assert tuple(out.infer.scales) == (25, 45)  # explicit wins
    assert any("WARNING" in m for m in msgs)


def test_reconcile_scales_silent_on_match():
    from dynseg.cli import _reconcile_scales

    cfg = _cfg(["--values", "9,13"])
    sch = _restored_scheduler((9, 13), [9, 13])
    msgs = []
    out = _reconcile_scales(cfg, sch, msgs.append)
    assert tuple(out.infer.scales) == (9, 13) and not msgs


def test_scheduler_knob_flags():
    cfg = _cfg(["--sched_temperature", "0.25", "--sched_ema", "0.8",
                "--pool_backward", "pallas"])
    assert cfg.sched.temperature == 0.25 and cfg.sched.ema == 0.8
    assert cfg.model.pool_backward == "pallas"
    assert cfg.sched.favor_high_score  # default: paper reading
    cfg = _cfg(["--sched_favor", "low"])
    assert not cfg.sched.favor_high_score


def test_model_bracket_knob_flags():
    # The two remaining bracket knobs must be flag-settable (verdict r2 #2).
    cfg = _cfg(["--leaky_slope", "0.2", "--use_batch_norm", "false"])
    assert cfg.model.leaky_slope == 0.2
    assert not cfg.model.use_batch_norm
    cfg = _cfg([])
    assert cfg.model.leaky_slope == 0.1 and cfg.model.use_batch_norm


def test_dataset_kwargs_escape_hatch():
    from dynseg.cli import _loader_kwargs

    cfg = _cfg(["--dataset", "synthetic_texture", "--dataset_kwargs",
                '{"class_probs": [0.02, 0.08, 0.55, 0.35], "size": 128}'])
    kw = _loader_kwargs(cfg)
    assert kw["class_probs"] == (0.02, 0.08, 0.55, 0.35)  # list -> tuple
    assert kw["size"] == 128 and kw["seed"] == cfg.train.seed
    with pytest.raises(ValueError, match="valid JSON"):
        _loader_kwargs(_cfg(["--dataset_kwargs", "{nope"]))
    with pytest.raises(ValueError, match="JSON object"):
        _loader_kwargs(_cfg(["--dataset_kwargs", "[1,2]"]))


def test_protocol_mismatch_warning():
    """Review r2: stats sidecar records the data protocol (val_tiles/
    bands/extra_bands) that produced the checkpoint — evaluating under a
    different protocol must warn loudly (scores incomparable / val split
    possibly overlapping training tiles), while staying non-fatal (a
    deliberate protocol change remains possible)."""
    from dynseg.cli import _warn_protocol_mismatch

    stats = {"val_tiles": "11,15", "bands": "rgbir", "extra_bands": ""}

    # matching protocol: silent
    cfg = _cfg(["--val_tiles", "11,15", "--bands", "rgbir"])
    msgs = []
    _warn_protocol_mismatch(cfg, stats, msgs.append)
    assert not msgs, msgs

    # differing split + bands: one warning per mismatched knob
    cfg = _cfg(["--bands", "rgb"])
    msgs = []
    _warn_protocol_mismatch(cfg, stats, msgs.append)
    assert sum("WARNING" in m for m in msgs) == 2
    assert any("--val_tiles" in m and "11,15" in m for m in msgs)
    assert any("--bands" in m and "rgb" in m for m in msgs)

    # pre-provenance sidecar (keys absent) + default flags: silent
    msgs = []
    _warn_protocol_mismatch(_cfg([]), {}, msgs.append)
    assert not msgs, msgs

    # review r2: cross-dataset and cross-fold evaluation were silent —
    # both are recorded and compared now
    stats = {"dataset": "potsdam", "fold": 0}
    msgs = []
    _warn_protocol_mismatch(
        _cfg(["--dataset", "vaihingen", "--fold", "1"]), stats, msgs.append)
    assert any("--dataset" in m and "potsdam" in m for m in msgs), msgs
    assert any("--fold" in m for m in msgs), msgs
    msgs = []
    _warn_protocol_mismatch(
        _cfg(["--dataset", "potsdam", "--fold", "0"]), stats, msgs.append)
    assert not msgs, msgs


def test_config_rejects_duplicate_values_and_bad_dense_params():
    """review r2 (round 2): duplicate --values double-weighted the
    multinomial and collapsed on restore (schedule changed across a
    resume); negative --dense_halo produced wrong block slicing."""
    import dataclasses

    from dynseg.config import Config, InferConfig, SchedulerConfig

    with pytest.raises(ValueError, match="duplicates"):
        Config(sched=SchedulerConfig(values=(25, 35, 35))).validate()
    with pytest.raises(ValueError, match="dense_halo"):
        Config(infer=InferConfig(dense_halo=-1)).validate()
    with pytest.raises(ValueError, match="dense_block"):
        Config(infer=InferConfig(dense_block=0)).validate()


def test_keep_best_default_on_and_no_keep_best():
    """r4 (collapse diagnosis, VERDICT r3 #2): --keep_best is DEFAULT ON
    — the final iterate is a lottery on a late-training oscillation and
    the best-validation checkpoint recovers every measured collapse.
    --no_keep_best must disable it; an explicit --keep_best still works."""
    from dynseg.cli import build_argparser

    base = ["--operation", "training", "--dataset", "synthetic",
            "--output_path", "/tmp/x"]
    assert build_argparser().parse_args(base).keep_best is True
    assert build_argparser().parse_args(
        base + ["--no_keep_best"]).keep_best is False
    assert build_argparser().parse_args(
        base + ["--keep_best"]).keep_best is True


def test_ema_flags_resolution():
    """--ema_decay threads into TrainConfig; --use_ema tri-state:
    None (auto) / True / False; bad decay values are refused."""
    base = ["--operation", "training", "--dataset", "synthetic"]
    args = build_argparser().parse_args(base)
    assert args.use_ema is None and args.ema_decay == 0.0
    assert config_from_args(args).train.ema_decay == 0.0

    args = build_argparser().parse_args(base + ["--ema_decay", "0.999"])
    assert config_from_args(args).train.ema_decay == 0.999
    assert config_from_args(args).train.ema_recalib_batches == 50
    args = build_argparser().parse_args(
        base + ["--ema_recalib_batches", "0"])
    assert config_from_args(args).train.ema_recalib_batches == 0
    assert build_argparser().parse_args(
        base + ["--use_ema"]).use_ema is True
    assert build_argparser().parse_args(
        base + ["--no_use_ema"]).use_ema is False

    bad = build_argparser().parse_args(base + ["--ema_decay", "1.0"])
    with pytest.raises(ValueError, match="ema_decay"):
        config_from_args(bad).validate()


def test_lr_decay_checkpoint_evals_without_lr_flags(tmp_path):
    """r5 (found by the 10k LR-decay soak): lr_decay_rate < 1 swaps the
    constant LR for an optax schedule, adding a count leaf to the
    opt_state — validate_test invoked WITHOUT the lr flags must adopt
    the schedule layout from the stats sidecar (like ema_decay) instead
    of failing the orbax restore with a tree mismatch."""
    import dataclasses

    from dynseg.cli import (build_argparser, config_from_args, run_testing,
                            run_training)

    args = build_argparser().parse_args([
        "--operation", "training", "--dataset", "synthetic",
        "--output_path", str(tmp_path), "--net_type", "dilated_grsl",
        "--distribution_type", "single_fixed", "--values", "9",
        "--niter", "6", "--batch_size", "8", "--window_batch", "32",
        "--lr_decay_rate", "0.5", "--lr_decay_steps", "3",
        "--no_prediction_maps",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, width_multiplier=0.125),
        train=dataclasses.replace(cfg.train, eval_every=10_000,
                                  checkpoint_every=10_000),
    )
    run_training(cfg, log=lambda *_: None)
    # eval WITHOUT --lr_decay_rate: the sidecar must supply the layout
    eargs = build_argparser().parse_args([
        "--operation", "validate_test", "--dataset", "synthetic",
        "--output_path", str(tmp_path), "--net_type", "dilated_grsl",
        "--values", "9", "--window_batch", "32", "--no_prediction_maps",
    ])
    ecfg = config_from_args(eargs)
    ecfg = dataclasses.replace(
        ecfg, model=dataclasses.replace(ecfg.model, width_multiplier=0.125))
    scores = run_testing(ecfg, log=lambda *_: None)
    assert 0.0 <= float(scores["oa"]) <= 1.0


def test_resume_refuses_lr_schedule_toggle(tmp_path):
    """r5: constant<->schedule LR cannot be toggled on --resume (the
    schedule adds a count leaf to the opt_state); the refusal must be a
    clear error, not an orbax tree mismatch."""
    import dataclasses

    import pytest as _pytest

    from dynseg.cli import build_argparser, config_from_args, run_training

    base = [
        "--operation", "training", "--dataset", "synthetic",
        "--output_path", str(tmp_path), "--net_type", "dilated_grsl",
        "--distribution_type", "single_fixed", "--values", "9",
        "--niter", "4", "--batch_size", "8", "--window_batch", "32",
        "--no_prediction_maps",
    ]
    args = build_argparser().parse_args(base + ["--lr_decay_rate", "0.5",
                                                "--lr_decay_steps", "2"])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(cfg.model, width_multiplier=0.125),
        train=dataclasses.replace(cfg.train, eval_every=10_000,
                                  checkpoint_every=2),
    )
    run_training(cfg, log=lambda *_: None)
    # resume WITHOUT the schedule -> refuse loudly
    rargs = build_argparser().parse_args(base + ["--resume",
                                                 "--niter", "6"])
    rcfg = config_from_args(rargs)
    rcfg = dataclasses.replace(
        rcfg,
        model=dataclasses.replace(rcfg.model, width_multiplier=0.125),
        train=dataclasses.replace(rcfg.train, eval_every=10_000,
                                  checkpoint_every=2, resume=True))
    with _pytest.raises(ValueError, match="lr_decay_rate"):
        run_training(rcfg, log=lambda *_: None)
