"""Post-training int8 serving path (dynseg/ops/quant.py; beyond
reference — the v5e MXU int8 region measured in docs/DESIGN.md).

Strategy: (1) the functional inference forward must match
model.apply(train=False) bit-for-bit in float for EVERY net_type — that
pins the mirror against architecture drift; (2) the int8 path must stay
close in softmax space and must quantize exactly the measured win region
(both channel dims >= min_ch); (3) the Inferencer/CLI integration must
produce near-identical maps to the float path end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynseg.config import Config, InferConfig, ModelConfig
from dynseg.models.dilated import build_model
from dynseg.ops import quant as Q

NETS = (
    "dilated_icpr_rate6",
    "dilated_icpr_rate6_densely",
    "dilated_grsl",
    "dilated_grsl_rate8",
    "dilated_icpr_original",
)


def _init(mcfg, hw=33, batch=2, seed=0):
    model = build_model(mcfg)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.normal(size=(batch, hw, hw, mcfg.num_input_bands)).astype(
            np.float32))
    variables = model.init(jax.random.PRNGKey(seed), x, train=False)
    return model, variables, x


@pytest.mark.parametrize("net", NETS)
@pytest.mark.parametrize("use_bn", [True, False])
def test_float_forward_parity(net, use_bn):
    """The functional mirror == flax apply, float, all variants."""
    mcfg = ModelConfig(net_type=net, num_classes=4, num_input_bands=3,
                       width_multiplier=0.25, use_batch_norm=use_bn)
    model, variables, x = _init(mcfg)
    ref = model.apply(variables, x, train=False)
    out = Q.make_apply(mcfg)(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=0, atol=1e-5)


def test_quant_plan_matches_measured_win_region():
    """Full-width rate6: 3->64, 64->64, 64->128 stay float (measured
    LOSSES on v5e); 128->128, 128->256, 256->256 quantize."""
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=5)
    assert Q.quant_plan(mcfg, 3) == [False, False, False, True, True, True]
    # grsl (5 blocks) same rule
    assert Q.quant_plan(
        ModelConfig(net_type="dilated_grsl", num_classes=5), 3
    ) == [False, False, False, True, True]
    # dense wiring: block 2's input is 3+64+64=131 channels -> quantized
    assert Q.quant_plan(
        ModelConfig(net_type="dilated_icpr_rate6_densely", num_classes=5), 3
    ) == [False, False, True, True, True, True]
    # narrow test model: nothing reaches 128 channels
    assert not any(Q.quant_plan(
        ModelConfig(net_type="dilated_icpr_rate6", num_classes=5,
                    width_multiplier=0.25), 3))


def test_block_specs_channel_wiring():
    specs = Q.block_specs(
        ModelConfig(net_type="dilated_icpr_rate6_densely", num_classes=2), 3)
    assert [s["cin"] for s in specs] == [3, 67, 131, 259, 387, 643]
    assert [s["cout"] for s in specs] == [64, 64, 128, 128, 256, 256]


@pytest.mark.parametrize("net", ["dilated_icpr_rate6",
                                 "dilated_icpr_rate6_densely"])
def test_int8_forward_close_to_float(net):
    """All-layer int8 (min_ch=1 to exercise every block on the narrow
    test model) stays close to the float forward in softmax space."""
    mcfg = ModelConfig(net_type=net, num_classes=4, num_input_bands=3,
                       width_multiplier=0.25)
    model, variables, x = _init(mcfg)
    ranges = Q.calibrate(mcfg, variables, [x], 100.0)
    assert set(ranges) == (
        {f"DilatedConvBlock_{i}" for i in range(6)} | {"__head__"})
    assert all(v > 0 for v in ranges.values())
    qv = Q.quantize_variables(mcfg, variables, ranges, num_input_bands=3,
                              min_ch=1)
    ref = jax.nn.softmax(model.apply(variables, x, train=False), -1)
    out = jax.nn.softmax(Q.make_apply(mcfg)(qv, x, train=False), -1)
    assert float(jnp.abs(ref - out).max()) < 0.05
    assert float((ref.argmax(-1) == out.argmax(-1)).mean()) > 0.97


def test_int8_streaming_matches_unfused_exactly():
    """The fused int8 carry (requant in the epilogue + int8 max-pool)
    must be BIT-IDENTICAL to the naive per-block quantize scheme: max
    commutes with the monotonic quantize. Run the naive scheme by
    driving _block_forward directly with no streaming."""
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=4,
                       num_input_bands=3, width_multiplier=0.25)
    model, variables, x = _init(mcfg)
    ranges = Q.calibrate(mcfg, variables, [x], 100.0)
    qv = Q.quantize_variables(mcfg, variables, ranges, num_input_bands=3,
                              min_ch=1)
    fused = Q.make_apply(mcfg)(qv, x, train=False)

    # naive: every block standalone-quantizes its own float input
    params, stats, quant = qv["params"], qv["batch_stats"], qv["quant"]
    h = x
    for spec in Q.block_specs(mcfg, 3):
        h, _ = Q._block_forward(mcfg, spec, params[spec["name"]],
                                stats[spec["name"]], quant[spec["name"]],
                                h, None, 100.0)
    head = params["ScoreHead_0"]["Conv_0"]
    dt = jnp.dtype(mcfg.compute_dtype)
    naive = (Q._conv(h.astype(dt), head["kernel"].astype(dt), 1, dt)
             + head["bias"].astype(dt)).astype(jnp.float32)
    np.testing.assert_array_equal(np.asarray(fused), np.asarray(naive))


def test_int8_exit_close_and_flagged():
    """--quant_exit quantizes the head input (approximate): output must
    stay close to float, and the tree must carry the __exit__ scale."""
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=4,
                       num_input_bands=3, width_multiplier=0.25)
    model, variables, x = _init(mcfg)
    ranges = Q.calibrate(mcfg, variables, [x], 100.0)
    assert "__head__" in ranges and ranges["__head__"] > 0
    qv = Q.quantize_variables(mcfg, variables, ranges, num_input_bands=3,
                              min_ch=1, exit_int8=True)
    assert "__exit__" in qv["quant"]
    ref = jax.nn.softmax(model.apply(variables, x, train=False), -1)
    out = jax.nn.softmax(Q.make_apply(mcfg)(qv, x, train=False), -1)
    assert float(jnp.abs(ref - out).max()) < 0.06
    assert float((ref.argmax(-1) == out.argmax(-1)).mean()) > 0.97
    # dense-concat wiring has no exit stream -> actionable error
    dcfg = ModelConfig(net_type="dilated_icpr_rate6_densely", num_classes=4,
                       num_input_bands=3, width_multiplier=0.25)
    _, dvars, dx = _init(dcfg)
    dranges = Q.calibrate(dcfg, dvars, [dx], 100.0)
    with pytest.raises(ValueError, match="sequential"):
        Q.quantize_variables(dcfg, dvars, dranges, num_input_bands=3,
                             min_ch=1, exit_int8=True)


def test_quantize_variables_tree_properties():
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=4,
                       num_input_bands=3, width_multiplier=0.25)
    model, variables, x = _init(mcfg)
    ranges = Q.calibrate(mcfg, variables, [x], 99.9)
    qv = Q.quantize_variables(mcfg, variables, ranges, num_input_bands=3,
                              min_ch=1)
    for name, qe in qv["quant"].items():
        k = qv["params"][name]["Conv_0"]["kernel"]
        assert k.dtype == jnp.int8
        assert int(jnp.abs(k).max()) <= 127
        assert qe["w_scale"].shape == (k.shape[-1],)
        assert float(qe["act_scale"]) > 0
    # the float tree is untouched (load-time transform, not in-place)
    for name in qv["quant"]:
        assert variables["params"][name]["Conv_0"]["kernel"].dtype == \
            jnp.float32
    # batch_stats pass through unchanged
    assert qv["batch_stats"] is variables["batch_stats"]


def test_quantize_errors():
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=4,
                       num_input_bands=3, width_multiplier=0.25)
    _, variables, x = _init(mcfg)
    # no blocks selected at full min_ch on the narrow model -> actionable
    with pytest.raises(ValueError, match="selected no blocks"):
        Q.quantize_variables(mcfg, variables, {"DilatedConvBlock_0": 1.0},
                             num_input_bands=3, min_ch=128)
    # missing calibration for a selected block -> actionable
    with pytest.raises(ValueError, match="no calibration range"):
        Q.quantize_variables(mcfg, variables, {}, num_input_bands=3,
                             min_ch=1)


def test_quant_apply_rejects_training():
    mcfg = ModelConfig(net_type="dilated_icpr_rate6", num_classes=4,
                       width_multiplier=0.25)
    _, variables, x = _init(mcfg)
    with pytest.raises(ValueError, match="inference-only"):
        Q.make_apply(mcfg)(variables, x, train=True)


def test_config_validation():
    from dataclasses import replace

    cfg = Config()
    with pytest.raises(ValueError, match="quant"):
        replace(cfg, infer=InferConfig(quant="int4")).validate()
    with pytest.raises(ValueError, match="quant_calib_pct"):
        replace(cfg, infer=InferConfig(quant_calib_pct=0.0)).validate()
    with pytest.raises(ValueError, match="quant_calib_crops"):
        replace(cfg, infer=InferConfig(quant_calib_crops=0)).validate()
    replace(cfg, infer=InferConfig(quant="int8")).validate()
    # exit + dense-concat wiring refused at config time, not deep in
    # quantize_variables
    dense_model = replace(cfg.model, net_type="dilated_icpr_rate6_densely")
    with pytest.raises(ValueError, match="sequential"):
        replace(cfg, model=dense_model,
                infer=InferConfig(quant="int8", quant_exit=True)).validate()
    # quant_exit without quant is inert, not an error
    replace(cfg, model=dense_model,
            infer=InferConfig(quant_exit=True)).validate()


def test_inferencer_quant_end_to_end():
    """Inferencer.enable_quant: quantized dense + window predictions stay
    near the float maps on a trained-ish synthetic model."""
    from dynseg.cli import build_argparser, config_from_args
    from dynseg.data.datasets import load_dataset
    from dynseg.infer import Inferencer

    args = build_argparser().parse_args([
        "--operation", "validate_test", "--dataset", "synthetic",
        "--values", "15", "--window_batch", "16", "--dense_halo", "8",
        "--quant", "int8", "--quant_min_ch", "1", "--quant_calib_crops", "2",
    ])
    cfg = config_from_args(args)
    import dataclasses
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, width_multiplier=0.125, num_input_bands=3))
    _, test_tiles = load_dataset("synthetic", size=48, num_tiles=1, seed=0)
    model = build_model(cfg.model)
    x0 = jnp.zeros((1, 15, 15, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    inf_f = Inferencer(cfg, test_tiles)
    pred_f, prob_f = inf_f.predict_tile_dense(variables, 0, block=32, halo=8)

    inf_q = Inferencer(cfg, test_tiles)
    qvars = inf_q.enable_quant(variables)
    assert "quant" in qvars
    pred_q, prob_q = inf_q.predict_tile_dense(qvars, 0, block=32, halo=8)
    assert np.abs(prob_f - prob_q).max() < 0.08
    assert (pred_f == pred_q).mean() > 0.95
    # window path shares the swapped apply
    pred_wf, _ = inf_f.predict_tile(variables, 0)
    pred_wq, _ = inf_q.predict_tile(qvars, 0)
    assert (pred_wf == pred_wq).mean() > 0.95


def test_quant_multi_device_matches_single():
    """The quantized forward under the 8-device data-parallel mesh must
    reproduce the single-device quantized predictions exactly (blocks
    shard across chips; int8 params replicate)."""
    import dataclasses

    from dynseg.cli import build_argparser, config_from_args
    from dynseg.data.datasets import load_dataset
    from dynseg.infer import Inferencer

    args = build_argparser().parse_args([
        "--operation", "validate_test", "--dataset", "synthetic",
        "--values", "15", "--window_batch", "16", "--dense_halo", "8",
        "--quant", "int8", "--quant_min_ch", "1", "--quant_calib_crops", "2",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, width_multiplier=0.125, num_input_bands=3))
    _, tiles = load_dataset("synthetic", size=48, num_tiles=1, seed=0)
    model = build_model(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 15, 15, 3)), train=False)

    single = Inferencer(cfg, tiles)
    qv = single.enable_quant(variables)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))
    multi = Inferencer(cfg, tiles, mesh=mesh)
    qv8 = multi.enable_quant(variables)
    # same calibration data -> identical quantized tree
    chex_like = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), qv, qv8)
    del chex_like

    p1, pr1 = single.predict_tile_dense(qv, 0, block=16, halo=8)
    p8, pr8 = multi.predict_tile_dense(qv8, 0, block=16, halo=8)
    np.testing.assert_array_equal(p1, p8)
    np.testing.assert_allclose(pr1, pr8, atol=1e-5)


def test_quantized_export_roundtrip(tmp_path):
    """A --quant export bakes the int8 forward into the StableHLO
    artifact; the loaded artifact must match the live quantized apply."""
    import dataclasses

    from dynseg.config import Config, DataConfig, InferConfig, \
        SchedulerConfig, TrainConfig
    from dynseg.export import ExportedPredictor, export_predictor

    mcfg = ModelConfig(net_type="dilated_grsl", num_classes=3,
                       num_input_bands=3, width_multiplier=0.125)
    cfg = Config(
        model=mcfg,
        sched=SchedulerConfig(distribution_type="multi_fixed",
                              values=(9, 13)),
        train=TrainConfig(batch_size=4, seed=0),
        infer=InferConfig(quant="int8", quant_min_ch=1),
        data=DataConfig(dataset="synthetic"),
    )
    model, variables, x = _init(mcfg)
    ranges = Q.calibrate(mcfg, variables, [x], 100.0)
    qv = Q.quantize_variables(mcfg, variables, ranges, num_input_bands=3,
                              min_ch=1)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    out = str(tmp_path / "export")
    export_predictor(cfg, variables, mean, std, out, platforms=("cpu",),
                     quant_variables=qv)
    pred = ExportedPredictor.load(out)
    assert pred.manifest["quant"] == "int8"
    assert pred.manifest["quant_blocks"] == sorted(qv["quant"])
    rng = np.random.default_rng(1)
    raw = rng.normal(size=(1, 21, 21, 3)).astype(np.float32)
    got = pred.probs(raw)
    want = jax.nn.softmax(
        Q.make_apply(mcfg)(qv, jnp.asarray(raw), train=False), -1)
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-4)


def test_quantized_artifact_serves(tmp_path):
    """ServingEngine request plumbing over a quantized artifact: dense
    predictions must match the live quantized apply through the full
    numpy/mirror-pad/block pipeline."""
    from dynseg.config import Config, DataConfig, InferConfig, \
        SchedulerConfig, TrainConfig
    from dynseg.export import ExportedPredictor, export_predictor
    from dynseg.serve import ServingEngine

    mcfg = ModelConfig(net_type="dilated_grsl", num_classes=3,
                       num_input_bands=3, width_multiplier=0.125)
    cfg = Config(
        model=mcfg,
        sched=SchedulerConfig(distribution_type="multi_fixed",
                              values=(9, 13)),
        train=TrainConfig(batch_size=4, seed=0),
        infer=InferConfig(scales=(9, 13), window_batch=16, dense_halo=20,
                          quant="int8", quant_min_ch=1),
        data=DataConfig(dataset="synthetic"),
    )
    model, variables, x = _init(mcfg)
    ranges = Q.calibrate(mcfg, variables, [x], 100.0)
    qv = Q.quantize_variables(mcfg, variables, ranges, num_input_bands=3,
                              min_ch=1)
    out = str(tmp_path / "export")
    export_predictor(cfg, variables, np.zeros(3, np.float32),
                     np.ones(3, np.float32), out, platforms=("cpu",),
                     quant_variables=qv)
    eng = ServingEngine(ExportedPredictor.load(out), window_batch=16)
    rng = np.random.default_rng(2)
    img = rng.normal(size=(30, 26, 3)).astype(np.float32)
    labels, probs = eng.predict(img, mode="dense")
    assert labels.shape == (30, 26) and probs.shape == (30, 26, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_enable_quant_streaming_tiles():
    """enable_quant calibrates from HOST-resident tiles too (streaming
    mode: hbm budget below the packed set size)."""
    import dataclasses

    from dynseg.cli import build_argparser, config_from_args
    from dynseg.data.datasets import load_dataset
    from dynseg.infer import Inferencer

    args = build_argparser().parse_args([
        "--operation", "validate_test", "--dataset", "synthetic",
        "--values", "15", "--window_batch", "16", "--dense_halo", "8",
        "--quant", "int8", "--quant_min_ch", "1", "--quant_calib_crops", "3",
        "--hbm_budget_gb", "0.000001",
    ])
    cfg = config_from_args(args)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, width_multiplier=0.125, num_input_bands=3))
    _, tiles = load_dataset("synthetic", size=48, num_tiles=1, seed=0)
    model = build_model(cfg.model)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 15, 15, 3)), train=False)
    inf = Inferencer(cfg, tiles)
    assert inf._stream  # the budget forces host streaming
    qv = inf.enable_quant(variables)
    assert "quant" in qv
    pred, prob = inf.predict_tile_dense(qv, 0, block=16, halo=8)
    np.testing.assert_allclose(np.asarray(prob).sum(-1), 1.0, atol=1e-5)


def test_cli_quant_flag_roundtrip():
    from dynseg.cli import build_argparser, config_from_args

    args = build_argparser().parse_args([
        "--operation", "validate_test", "--dataset", "synthetic",
        "--quant", "int8", "--quant_min_ch", "64",
        "--quant_calib_pct", "100", "--quant_calib_crops", "4",
    ])
    cfg = config_from_args(args)
    assert cfg.infer.quant == "int8"
    assert cfg.infer.quant_min_ch == 64
    assert cfg.infer.quant_calib_pct == 100.0
    assert cfg.infer.quant_calib_crops == 4
