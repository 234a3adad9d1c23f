"""Inference tests: window coverage, overlap-add voting parity with a
direct whole-tile forward (possible because the nets are shape-preserving),
and multi-scale fusion (SURVEY.md C14/C15)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynseg.config import Config, DataConfig, InferConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.data.datasets import load_synthetic
from dynseg.data.tiles import pack_tiles, compute_stats
from dynseg.infer import Inferencer, validate_test, window_origins
from dynseg.models.dilated import build_model


def cfg_for(scales, window_batch=8, stride_fraction=0.5):
    return Config(
        model=ModelConfig(
            net_type="dilated_grsl", num_classes=3, num_input_bands=3,
            width_multiplier=0.125, use_batch_norm=False,
        ),
        infer=InferConfig(
            scales=tuple(scales), window_batch=window_batch,
            stride_fraction=stride_fraction,
        ),
    )


@pytest.mark.parametrize(
    "lo,hi,size,stride",
    [(10, 74, 16, 8), (10, 75, 15, 7), (0, 5, 5, 5), (10, 74, 16, 16), (3, 100, 33, 16)],
)
def test_window_origins_cover_range(lo, hi, size, stride):
    # Exercise BOTH regimes: a generous lim and the BINDING lim real
    # callers use (lim = padded_extent - size, forcing edge snapping) —
    # with only the generous one, the clamp logic was untested and the
    # bound assertion near-vacuous (review r2, round 2).
    for lim in (hi + size, max(0, hi - size + size // 2), max(0, hi - size)):
        origins = window_origins(lo, hi, size, stride, lim)
        covered = np.zeros(hi + 2 * size, bool)
        for r in origins:
            assert 0 <= r <= lim, (r, lim)
        for r in origins:
            covered[r : r + size] = True
        assert covered[lo : min(hi, lim + size)].all(), (lim, origins)


def test_window_origins_impossible_coverage_raises():
    """lim too small to cover [lo, hi) must raise, not emit origins that
    read past the padded array (review r2, round 2)."""
    with pytest.raises(ValueError, match="cover"):
        window_origins(0, 100, 10, 10, 50)


def _tileset(rng, h=40, w=52, nc=3):
    img = rng.normal(size=(h, w, 3)).astype(np.float32) * 20 + 100
    mask = rng.integers(0, nc, size=(h, w)).astype(np.int32)
    ts = pack_tiles([img], [mask])
    compute_stats(ts)
    return ts


def test_overlap_add_matches_host_reference(rng):
    """Golden test of the on-device overlap-add (K3 path): averaged
    softmax voting must bit-match a host numpy implementation of the same
    slide -> forward -> accumulate -> normalize pipeline (SURVEY.md §4)."""
    cfg = cfg_for(scales=(16,), stride_fraction=0.25)
    ts = _tileset(rng)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))

    inf = Inferencer(cfg, ts)
    pred, prob = inf.predict_tile(variables, 0)
    h, w = (int(x) for x in ts.valid_hw[0])
    assert pred.shape == (h, w) and prob.shape == (h, w, 3)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-5)

    # host reference: same windows, per-window forward, numpy accumulate
    s, stride = 16, 4
    pad = inf.pad
    padded = np.asarray(inf.images[0], np.float32)  # packed storage == padded values
    Hp, Wp = padded.shape[:2]
    rows = window_origins(pad, pad + h, s, stride, Hp - s)
    cols = window_origins(pad, pad + w, s, stride, Wp - s)
    acc = np.zeros((Hp, Wp, 3), np.float64)
    cnt = np.zeros((Hp, Wp, 1), np.float64)
    for r in rows:
        for c in cols:
            win = (padded[r : r + s, c : c + s] - ts.mean) / ts.std
            logits = model.apply(variables, jnp.asarray(win)[None], train=False)
            p = np.asarray(jax.nn.softmax(logits[0], axis=-1))
            acc[r : r + s, c : c + s] += p
            cnt[r : r + s, c : c + s] += 1.0
    ref = acc[pad : pad + h, pad : pad + w] / cnt[pad : pad + h, pad : pad + w]
    np.testing.assert_allclose(prob, ref, atol=1e-4)
    np.testing.assert_array_equal(pred, np.argmax(ref, axis=-1))


def test_dense_mode_matches_whole_tile_forward(rng):
    """Blockwise dense inference with halo >= receptive field must equal
    the single whole-tile forward exactly (fully-convolutional nets)."""
    cfg = cfg_for(scales=(16,))
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dense_block=16, dense_halo=40)
    )
    ts = _tileset(rng, h=45, w=37)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    inf = Inferencer(cfg, ts)
    pred, prob = inf.predict_tile_dense(variables, 0, block=16, halo=40)
    assert pred.shape == (45, 37)

    # whole-tile reference: same mirror pad, crop valid region
    h, w = 45, 37
    padded = np.asarray(inf.images[0], np.float32)  # packed storage == padded values
    norm = (padded - ts.mean) / ts.std
    logits = model.apply(variables, jnp.asarray(norm)[None], train=False)[0]
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))
    ref = probs[inf.pad : inf.pad + h, inf.pad : inf.pad + w]
    np.testing.assert_allclose(prob, ref, atol=1e-5)


def test_dense_block_batch_is_output_invariant(rng):
    """dense_block_batch is a pure scheduling knob (how many blocks ride
    one batched forward — the v5e sublane-fill optimization, r3): every
    value, and auto, must produce the identical probability map."""
    ts = _tileset(rng, h=45, w=37)
    ref = None
    for bb in (1, 3, 8, 0):  # 0 = auto
        cfg = cfg_for(scales=(16,))
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(
                cfg.infer, dense_block=16, dense_halo=40,
                dense_block_batch=bb))
        model = build_model(cfg.model)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
        inf = Inferencer(cfg, ts)
        pred, prob = inf.predict_tile_dense(variables, 0, block=16, halo=40)
        if ref is None:
            ref = (pred, prob)
        else:
            np.testing.assert_array_equal(pred, ref[0])
            np.testing.assert_allclose(prob, ref[1], atol=1e-6)


def test_validate_test_dense_mode(rng):
    cfg = cfg_for(scales=(12,), window_batch=16)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(
            cfg.infer, mode="dense", dense_block=24, dense_halo=30)
    )
    ts = _tileset(rng, h=24, w=24)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    scores = validate_test(cfg, variables, ts, log=lambda *_: None)
    assert int(scores["confusion"].sum()) == 24 * 24


def test_multiscale_fusion_runs(rng):
    cfg = cfg_for(scales=(12, 16), window_batch=16)
    ts = _tileset(rng, h=30, w=30)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    inf = Inferencer(cfg, ts)
    pred, prob = inf.predict_tile(variables, 0)
    assert pred.shape == (30, 30)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-5)


@pytest.mark.parametrize("chunk", [1, 3, 1000])
def test_scan_chunk_invariance(rng, chunk):
    """Predictions must be identical for any launch-chunk size: chunk=1
    (all single-step launches), a bulk+tail mix, and chunk >> batches
    (all tail singles)."""
    ts = _tileset(rng, h=40, w=34)
    model = build_model(cfg_for(scales=(12,)).model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    results = []
    for c in (8, chunk):
        cfg = cfg_for(scales=(12, 16), window_batch=16)
        # window_fold=off: this test pins the LEGACY chunked-launch
        # structure (the fold ignores scan_chunk entirely).
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(
                cfg.infer, scan_chunk=c, dense_scan_chunk=max(1, c // 2),
                dense_block=16, dense_halo=30, window_fold="off")
        )
        inf = Inferencer(cfg, ts)
        pw, prw = inf.predict_tile(variables, 0)
        pd, prd = inf.predict_tile_dense(variables, 0, block=16, halo=30)
        results.append((pw, prw, pd, prd))
    (pw1, prw1, pd1, prd1), (pw2, prw2, pd2, prd2) = results
    np.testing.assert_array_equal(pw1, pw2)
    np.testing.assert_allclose(prw1, prw2, atol=1e-6)
    np.testing.assert_array_equal(pd1, pd2)
    np.testing.assert_allclose(prd1, prd2, atol=1e-6)


def test_streaming_mode_matches_device_resident(rng):
    """Tile sets over the HBM budget stream from host per tile; results
    must be identical to whole-set device residency."""
    ts = _tileset(rng, h=36, w=30)
    model = build_model(cfg_for(scales=(12,)).model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    results = []
    for budget in (10.0, 1e-9):  # resident vs forced streaming
        cfg = cfg_for(scales=(12, 16), window_batch=16)
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(
                cfg.infer, hbm_budget_gb=budget, dense_block=16, dense_halo=30)
        )
        inf = Inferencer(cfg, ts)
        assert inf._stream == (budget < 1.0)
        pw, prw = inf.predict_tile(variables, 0)
        pd, prd = inf.predict_tile_dense(variables, 0, block=16, halo=30)
        results.append((pw, prw, pd, prd))
    (a, pa, b, pb), (c, pc, d, pd_) = results
    np.testing.assert_array_equal(a, c)
    np.testing.assert_allclose(pa, pc, atol=1e-6)
    np.testing.assert_array_equal(b, d)
    np.testing.assert_allclose(pb, pd_, atol=1e-6)


def test_stride_fraction_above_one_has_no_holes(rng):
    """stride > window would leave zero-vote pixels; the stride is clamped
    so every pixel gets at least one vote."""
    cfg = cfg_for(scales=(12,), stride_fraction=3.0)
    ts = _tileset(rng, h=40, w=40)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    inf = Inferencer(cfg, ts)
    _, prob = inf.predict_tile(variables, 0)
    np.testing.assert_allclose(prob.sum(-1), 1.0, atol=1e-5)  # votes everywhere


def test_multi_device_inference_matches_single(rng):
    """DP inference over the 8-device virtual mesh must produce exactly
    the single-device predictions (windows/blocks shard; overlap-add is
    replicated)."""
    import jax.sharding as shd

    cfg = cfg_for(scales=(12, 16), window_batch=16)
    # window_fold=off: the grid-fold is single-device-only, so exact
    # equality requires both legs on the legacy accumulator (fold parity
    # has its own tests below).
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dense_block=16,
                                       dense_halo=30, window_fold="off")
    )
    ts = _tileset(rng, h=40, w=34)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    single = Inferencer(cfg, ts)
    mesh = shd.Mesh(np.array(jax.devices()[:8]), ("data",))
    multi = Inferencer(cfg, ts, mesh=mesh)

    p1, pr1 = single.predict_tile(variables, 0)
    p8, pr8 = multi.predict_tile(variables, 0)
    np.testing.assert_array_equal(p1, p8)
    np.testing.assert_allclose(pr1, pr8, atol=1e-5)

    d1, dpr1 = single.predict_tile_dense(variables, 0, block=16, halo=30)
    d8, dpr8 = multi.predict_tile_dense(variables, 0, block=16, halo=30)
    np.testing.assert_array_equal(d1, d8)
    np.testing.assert_allclose(dpr1, dpr8, atol=1e-5)


def test_validate_test_reports_metrics(rng):
    cfg = cfg_for(scales=(12,), window_batch=16)
    ts = _tileset(rng, h=24, w=24)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    lines = []
    scores = validate_test(cfg, variables, ts, log=lines.append)
    assert 0.0 <= scores["oa"] <= 1.0
    assert "predictions" in scores and scores["predictions"][0].shape == (24, 24)
    assert any("TOTAL" in l for l in lines)
    assert int(scores["confusion"].sum()) == 24 * 24


def test_validate_test_eroded_boundary_metrics(rng):
    """--eval_eroded_boundaries: the ISPRS-protocol block must score
    against boundary-eroded GT — fewer pixels counted, metrics reported
    under scores['eroded']."""
    import dataclasses

    from dynseg.metrics import erode_boundaries
    from dynseg.data.tiles import IGNORE_LABEL

    cfg = cfg_for(scales=(12,), window_batch=16)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, eroded_boundary_radius=2))
    ts = _tileset(rng, h=24, w=24)
    # blocky GT so boundary erosion leaves interior pixels standing
    blocky = np.kron(
        (rng.uniform(size=(3, 3)) * 3).astype(np.int32),
        np.ones((8, 8), np.int32),
    )
    ts.masks[0, :24, :24] = blocky
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    lines = []
    scores = validate_test(cfg, variables, ts, log=lines.append)
    assert "eroded" in scores
    n_full = int(scores["confusion"].sum())
    n_eroded = int(scores["eroded"]["confusion"].sum())
    expected = int(np.sum(
        erode_boundaries(np.asarray(ts.masks[0]), 2) != IGNORE_LABEL))
    assert n_eroded == expected < n_full
    assert any("eroded" in l for l in lines)


def test_unequal_tile_sizes_match_solo_prediction(rng):
    """Reference parity (C14): each test tile is mirror-padded around its
    OWN valid area. A small tile packed with a larger one must predict
    identically to the same tile packed alone — the pack's zero fill
    must never leak into edge windows."""
    from dynseg.data.tiles import pack_tiles

    cfg = cfg_for(scales=(12,), window_batch=16)
    small = rng.uniform(0, 255, size=(24, 20, 3)).astype(np.float32)
    big = rng.uniform(0, 255, size=(40, 44, 3)).astype(np.float32)
    zeros = lambda im: np.zeros(im.shape[:2], np.int32)

    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    def predict_first(ts):
        ts.mean = np.zeros(3, np.float32)
        ts.std = np.ones(3, np.float32)
        inf = Inferencer(cfg, ts)
        _, prob = inf.predict_tile(variables, 0, return_probs=True)
        return prob

    prob_solo = predict_first(pack_tiles([small], [zeros(small)]))
    prob_packed = predict_first(
        pack_tiles([small, big], [zeros(small), zeros(big)]))
    np.testing.assert_allclose(prob_packed, prob_solo, atol=1e-5, rtol=1e-4)

    # HAZARD ZONE (review regression): pack slack SMALLER than the
    # window overhang — a naive fill-then-mirror wraps at the pack
    # boundary and diverges from the solo prediction.
    near = rng.uniform(0, 255, size=(30, 28, 3)).astype(np.float32)
    prob_near = predict_first(
        pack_tiles([small, near], [zeros(small), zeros(near)]))
    np.testing.assert_allclose(prob_near, prob_solo, atol=1e-5, rtol=1e-4)


def test_tiny_tile_top_left_context_is_own_mirror(rng):
    """Review r2: a tile SHORTER than the pad margin (h < pad — here
    pad = dense_halo = 40 > 24) had top/left mirror bands reflecting
    pack slack (zeros), so dense halos and large-scale windows saw zero
    context at the tile's top/left edge. Dense prediction of the tiny
    tile must match the tile packed alone."""
    from dynseg.data.tiles import pack_tiles

    cfg = cfg_for(scales=(12,), window_batch=16)
    tiny = rng.uniform(0, 255, size=(24, 20, 3)).astype(np.float32)
    big = rng.uniform(0, 255, size=(56, 60, 3)).astype(np.float32)
    zeros = lambda im: np.zeros(im.shape[:2], np.int32)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    def dense_first(ts):
        ts.mean = np.zeros(3, np.float32)
        ts.std = np.ones(3, np.float32)
        inf = Inferencer(cfg, ts)
        assert inf.pad > 24  # the hazard requires pad > valid h
        # no zero slack may survive anywhere in the tiny tile's padded
        # context (its content is strictly positive by construction)
        h, w = (int(x) for x in ts.valid_hw[0])
        crop = np.asarray(inf._tile(0))[: h + 2 * inf.pad, : w + 2 * inf.pad]
        assert (np.abs(crop).sum(axis=-1) > 0).all()
        pred, prob = inf.predict_tile_dense(variables, 0)
        return np.asarray(pred), np.asarray(prob)

    solo_p, solo_pr = dense_first(pack_tiles([tiny], [zeros(tiny)]))
    pk_p, pk_pr = dense_first(
        pack_tiles([tiny, big], [zeros(tiny), zeros(big)]))
    np.testing.assert_allclose(pk_pr, solo_pr, atol=1e-5, rtol=1e-4)
    np.testing.assert_array_equal(pk_p, solo_p)


def test_set_tiles_reuses_compiled_programs(rng):
    """Chunked prediction's Inferencer reuse: a re-bind with same-shape
    tiles must hit the existing jit cache (no new trace), and a re-bind
    with different normalization stats must be refused (stats are baked
    into the compiled programs as closure constants)."""
    cfg = cfg_for(scales=(12,), window_batch=8)
    ts1 = _tileset(rng, h=24, w=24)
    ts2 = _tileset(rng, h=24, w=24)
    ts2.mean, ts2.std = ts1.mean, ts1.std  # same stats: re-bind allowed
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    inf = Inferencer(cfg, ts1)
    p1, _ = inf.predict_tile(variables, 0)
    n_traces = inf._accumulate._cache_size()
    inf.set_tiles(ts2)
    p2, _ = inf.predict_tile(variables, 0)
    assert inf._accumulate._cache_size() == n_traces  # no re-trace
    assert p2.shape == p1.shape

    ts3 = _tileset(rng, h=24, w=24)  # its own stats: different
    with pytest.raises(ValueError, match="normalization stats"):
        inf.set_tiles(ts3)


def test_dihedral_inverse_property(rng):
    from dynseg.infer import _dihedral_img, _dihedral_inv

    x = jnp.asarray(rng.normal(size=(7, 5, 3)).astype(np.float32))
    for k in range(8):
        np.testing.assert_array_equal(
            np.asarray(_dihedral_inv(_dihedral_img(x, k), k)), np.asarray(x))


def test_tta_matches_host_composition(rng):
    """--tta: the on-device 8-transform fusion must equal predicting each
    dihedral variant of the raster separately (through the SAME pipeline)
    and averaging the inverse-transformed probability maps on host."""
    from dynseg.data.tiles import pack_tiles
    from dynseg.infer import _dihedral_img, _dihedral_inv

    cfg = cfg_for(scales=(12,), window_batch=16)
    h, w = 26, 22
    img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    def tileset_for(im):
        ts = pack_tiles([im], [np.zeros(im.shape[:2], np.int32)])
        ts.mean = np.zeros(3, np.float32)
        ts.std = np.ones(3, np.float32)
        return ts

    inf = Inferencer(cfg, tileset_for(img))
    pred_tta = np.asarray(
        inf.predict_tile_device(variables, 0, tta=True)).astype(np.int32)

    acc = None
    for k in range(8):
        im_k = np.asarray(_dihedral_img(jnp.asarray(img), k))
        inf_k = Inferencer(cfg, tileset_for(im_k))
        _, prob_k = inf_k.predict_tile(variables, 0, return_probs=True)
        prob_k = np.asarray(_dihedral_inv(jnp.asarray(prob_k), k))
        acc = prob_k if acc is None else acc + prob_k
    ref = acc.argmax(-1)
    agree = (pred_tta == ref).mean()
    assert agree > 0.995, agree
    # Pin the fused PROBABILITIES too: argmax agreement alone survived a
    # dropped/double-counted transform (review r2, round 2).
    _, prob_tta = inf.predict_tile(variables, 0, tta=True,
                                   return_probs=True)
    np.testing.assert_allclose(np.asarray(prob_tta), acc / 8.0,
                               atol=1e-4, rtol=1e-3)


def test_tta_through_validate_test(rng):
    """cfg.infer.tta flows through validate_test (both modes run)."""
    import dataclasses

    for mode in ("window", "dense"):
        cfg = cfg_for(scales=(12,), window_batch=16)
        cfg = dataclasses.replace(
            cfg, infer=dataclasses.replace(
                cfg.infer, tta=True, mode=mode, dense_block=16,
                dense_halo=30))
        ts = _tileset(rng, h=24, w=24)
        model = build_model(cfg.model)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
        scores = validate_test(cfg, variables, ts, log=lambda *_: None)
        assert int(scores["confusion"].sum()) == 24 * 24


def test_dihedral_convention_shared_across_libraries(rng):
    """One convention, two array libraries: numpy (serving) and jnp
    (on-device TTA) must produce identical transforms."""
    from dynseg.ops.dihedral import dihedral, dihedral_inv

    x = rng.normal(size=(6, 9, 2)).astype(np.float32)
    for k in range(8):
        np.testing.assert_array_equal(
            dihedral(x, k, np), np.asarray(dihedral(jnp.asarray(x), k, jnp)))
        np.testing.assert_array_equal(
            dihedral_inv(x, k, np),
            np.asarray(dihedral_inv(jnp.asarray(x), k, jnp)))


def test_tta_host_path_and_sliver_tiles(rng):
    """Review regressions: (a) predict_tile/predict_tile_dense honor tta
    and return the fused prob map; (b) dense TTA survives sliver tiles
    (h or w < 8 previously crashed on the block floor)."""
    import dataclasses

    from dynseg.data.tiles import pack_tiles

    cfg = cfg_for(scales=(12,), window_batch=16)
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, dense_block=16,
                                       dense_halo=14))
    sliver = rng.uniform(0, 255, size=(24, 6, 3)).astype(np.float32)
    ts = pack_tiles([sliver], [np.zeros(sliver.shape[:2], np.int32)])
    ts.mean = np.zeros(3, np.float32)
    ts.std = np.ones(3, np.float32)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    inf = Inferencer(cfg, ts)

    pred_w, prob_w = inf.predict_tile(variables, 0, tta=True)
    assert pred_w.shape == (24, 6) and prob_w.shape == (24, 6, 3)
    np.testing.assert_allclose(prob_w.sum(-1), 1.0, atol=1e-5)

    pred_d, prob_d = inf.predict_tile_dense(variables, 0, halo=14, tta=True)
    assert pred_d.shape == (24, 6) and prob_d.shape == (24, 6, 3)
    np.testing.assert_allclose(prob_d.sum(-1), 1.0, atol=1e-5)


def test_set_tiles_guard_leaves_inferencer_usable(rng):
    """A refused set_tiles (different stats) must not partially rebind —
    the Inferencer keeps predicting its ORIGINAL tiles correctly."""
    cfg = cfg_for(scales=(12,), window_batch=8)
    ts1 = _tileset(rng, h=24, w=24)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    inf = Inferencer(cfg, ts1)
    pred_before, _ = inf.predict_tile(variables, 0)

    ts_bad = _tileset(rng, h=24, w=24)  # its own (different) stats
    with pytest.raises(ValueError, match="normalization stats"):
        inf.set_tiles(ts_bad)
    pred_after, _ = inf.predict_tile(variables, 0)
    np.testing.assert_array_equal(pred_before, pred_after)


def test_tta_multi_device_matches_single(rng):
    """TTA composes with data-parallel inference: the 8-transform fusion
    on an 8-device mesh must match the single-device result."""
    ts = _tileset(rng, h=24, w=24)
    cfg = cfg_for(scales=(12,), window_batch=16)
    # Legacy accumulator on both legs (the grid-fold is single-device
    # only; exact equality needs matching add order).
    cfg = dataclasses.replace(
        cfg, infer=dataclasses.replace(cfg.infer, window_fold="off"))
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    single = Inferencer(cfg, ts)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))
    multi = Inferencer(cfg, ts, mesh=mesh)
    p1, pr1 = single.predict_tile(variables, 0, tta=True)
    p8, pr8 = multi.predict_tile(variables, 0, tta=True)
    np.testing.assert_array_equal(p1, p8)
    np.testing.assert_allclose(pr1, pr8, atol=1e-5)


def test_tta_dense_honors_explicit_block_halo(rng, monkeypatch):
    """ADVICE r1: predict_tile_dense(block=, halo=, tta=True) must thread
    the explicit block/halo into every TTA pass instead of silently
    substituting cfg.infer.dense_block/dense_halo."""
    cfg = cfg_for(scales=(12,), window_batch=16)
    ts = _tileset(rng, h=24, w=24)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    inf = Inferencer(cfg, ts)

    seen = []
    orig = Inferencer._dense_device

    def spy(self, variables, tile_idx, block, halo, override=None):
        seen.append((block, halo))
        return orig(self, variables, tile_idx, block, halo, override=override)

    monkeypatch.setattr(Inferencer, "_dense_device", spy)
    inf.predict_tile_dense(variables, 0, block=20, halo=24, tta=True)
    assert seen and all(bh == (20, 24) for bh in seen)


def test_fill_padded_context_h_equals_pad_boundary(rng):
    """review r2 (round 2): the mirror-rebuild condition used h < pad, so
    a tile whose valid height/width is EXACTLY pad reflected the pack's
    first zero-slack row into the outermost mirror row (np.pad reflect
    sets out[0] = in[pad], and in[pad] is the first slack row when
    h == pad). The padded crop must equal the tile padded alone."""
    from dynseg.data.tiles import mirror_pad, pack_tiles
    from dynseg.infer import _fill_padded_context

    pad = 16
    for h, w in ((16, 16), (16, 40), (40, 16)):  # ==pad on 1 or 2 axes
        tile = rng.uniform(1, 255, size=(h, w, 3)).astype(np.float32)
        big = rng.uniform(1, 255, size=(40, 40, 3)).astype(np.float32)
        zeros = lambda im: np.zeros(im.shape[:2], np.int32)
        ts = pack_tiles([tile, big], [zeros(tile), zeros(big)])
        padded = _fill_padded_context(
            mirror_pad(ts, pad, pad_masks=False), pad)
        solo = np.pad(tile, ((pad, pad), (pad, pad), (0, 0)),
                      mode="reflect")
        got = padded.images[0][: h + 2 * pad, : w + 2 * pad]
        np.testing.assert_array_equal(got, solo, err_msg=f"h={h} w={w}")


def test_dense_small_halo_warns_not_silent(rng):
    """review r2 (round 2): a dense halo below the net's receptive
    radius is legal (approximate mode) but was silent; it now warns
    once, naming the exact halo for exactness."""
    import warnings as _w

    cfg = cfg_for(scales=(12,))
    ts = _tileset(rng, h=40, w=40)
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))
    inf = Inferencer(cfg, ts)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        inf.predict_tile_dense(variables, 0, block=16, halo=2)
    assert any("receptive radius" in str(r.message) for r in rec)
    # halo > pad is now a ValueError, not a stripped assert
    with pytest.raises(ValueError, match="mirror pad"):
        inf.predict_tile_dense(variables, 0, block=16, halo=inf.pad + 1)


def test_inferencer_does_not_pin_host_copies(rng):
    """review r2 (round 2): the Inferencer kept the caller's TileSet, a
    float32 padded image copy, AND a padded int32 mask copy alive for
    its lifetime — tens of GB at production tile counts. Only the packed
    storage array and small metadata may survive set_tiles."""
    ts = _tileset(rng)
    inf = Inferencer(cfg_for(scales=(16,)), ts)
    assert not hasattr(inf, "padded"), "padded TileSet pinned again"
    assert not hasattr(inf, "tiles"), "caller TileSet pinned again"
    # metadata survives; masks were never padded (pad_masks=False)
    assert inf.valid_hw.shape == (1, 2)
    h, w = inf.padded_hw
    assert h == ts.images.shape[1] + 2 * inf.pad


# ------------------------- grid-fold overlap-add (r5) ------------------ #
def _fold_cfgs(scales, stride_fraction=0.5, window_batch=8):
    base = cfg_for(scales, window_batch=window_batch,
                   stride_fraction=stride_fraction)
    on = dataclasses.replace(
        base, infer=dataclasses.replace(base.infer, window_fold="on"))
    off = dataclasses.replace(
        base, infer=dataclasses.replace(base.infer, window_fold="off"))
    return on, off


@pytest.mark.parametrize("stride_fraction", [0.5, 1.0])
def test_window_fold_matches_legacy(rng, stride_fraction):
    """The grid-fold accumulator must reproduce the legacy sequential
    RMW path: identical counts, probs equal to float-add reorder.
    stride_fraction=1.0 exercises clamped tail origins (non-uniform
    spacing -> the fold's sequential tail branch)."""
    ts = _tileset(rng, h=47, w=61)
    on, off = _fold_cfgs(scales=(12, 16), stride_fraction=stride_fraction)
    model = build_model(on.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 12, 12, 3)))

    inf_on = Inferencer(on, ts)
    inf_off = Inferencer(off, ts)
    # the fold must actually engage for this geometry
    s = 12
    stride = min(s, max(1, int(round(s * stride_fraction))))
    Hp, Wp = inf_on.padded_hw
    rows = window_origins(inf_on.pad, inf_on.pad + 47, s, stride, Hp - s)
    cols = window_origins(inf_on.pad, inf_on.pad + 61, s, stride, Wp - s)
    assert inf_on._use_fold(s, rows, cols)
    assert not inf_off._use_fold(s, rows, cols)

    p_on, pr_on = inf_on.predict_tile(variables, 0)
    p_off, pr_off = inf_off.predict_tile(variables, 0)
    np.testing.assert_allclose(pr_on, pr_off, atol=1e-5)
    # preds may only differ where probs tie to reorder tolerance
    diff = p_on != p_off
    if diff.any():
        top2 = np.sort(np.asarray(pr_off), axis=-1)
        assert (top2[..., -1] - top2[..., -2])[diff].max() < 1e-5
    assert inf_on._fold_jits, "fold program cache unexpectedly empty"
    assert not inf_off._fold_jits


def test_window_fold_tail_origins_covered(rng):
    """Clamped (off-stride) tail origins cannot arise through the
    Inferencer's own geometry (pad >= scale >= stride makes
    window_origins uniform), but _fold_program defends against them for
    any caller: a fabricated origin list with non-uniform tails must
    reproduce a numpy accumulate of exactly those windows."""
    ts = _tileset(rng, h=50, w=38)
    on, _ = _fold_cfgs(scales=(16,), window_batch=4)
    model = build_model(on.model)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))
    inf = Inferencer(on, ts)
    s, stride = 16, 12
    rows = [8, 20, 32, 44, 51]   # uniform prefix + clamped tail 51
    cols = [10, 22, 34, 43]      # uniform prefix + clamped tail 43
    from dynseg.infer import _split_uniform
    assert _split_uniform(rows, stride)[1] == [51]
    assert _split_uniform(cols, stride)[1] == [43]

    fn, origins_b = inf._fold_program(s, stride, rows, cols)
    Hp, Wp = inf.padded_hw
    prob = jnp.zeros((Hp, Wp, inf.nc), jnp.float32)
    cnt = jnp.zeros((Hp, Wp, 1), jnp.float32)
    tile = inf._tile(0)
    prob, cnt = fn(variables, tile, prob, cnt, jnp.asarray(origins_b))

    padded = np.asarray(inf.images[0], np.float32)
    acc = np.zeros((Hp, Wp, inf.nc), np.float64)
    ref_cnt = np.zeros((Hp, Wp, 1), np.float64)
    for r in rows:
        for c in cols:
            win = (padded[r:r + s, c:c + s] - ts.mean) / ts.std
            logits = model.apply(variables, jnp.asarray(win)[None],
                                 train=False)
            p = np.asarray(jax.nn.softmax(logits[0], axis=-1))
            acc[r:r + s, c:c + s] += p
            ref_cnt[r:r + s, c:c + s] += 1.0
    np.testing.assert_allclose(np.asarray(prob), acc, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cnt), ref_cnt)


def test_window_fold_auto_policy(rng):
    """auto: on for single-device few-shape sets within the memory cap;
    off under a mesh, past the cap, or with many distinct shapes."""
    import os

    ts = _tileset(rng, h=30, w=30)
    base = cfg_for(scales=(12,))
    inf = Inferencer(base, ts)
    rows = cols = list(range(40, 70, 6))
    assert inf._use_fold(12, rows, cols)

    # memory cap (env-tunable) forces the streaming legacy path
    os.environ["DYNSEG_FOLD_MEM_GB"] = "0.000001"
    try:
        assert not inf._use_fold(12, rows, cols)
    finally:
        del os.environ["DYNSEG_FOLD_MEM_GB"]
    assert inf._use_fold(12, rows, cols)

    # many distinct shapes: auto declines, "on" forces
    inf._n_distinct_hw = 5
    assert not inf._use_fold(12, rows, cols)
    on_cfg = dataclasses.replace(
        base, infer=dataclasses.replace(base.infer, window_fold="on"))
    inf_on = Inferencer(on_cfg, ts)
    inf_on._n_distinct_hw = 5
    assert inf_on._use_fold(12, rows, cols)

    # mesh: fold never engages (legacy path shards windows)
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), ("data",))
    inf_mesh = Inferencer(on_cfg, ts, mesh=mesh)
    assert not inf_mesh._use_fold(12, rows, cols)
