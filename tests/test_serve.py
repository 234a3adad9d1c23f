"""Serving layer (dynseg/serve.py): the HTTP server must run from the
export artifact alone, and its window-voting estimator must agree with the
on-device Inferencer (same windows, same softmax averaging — SURVEY.md
C15)."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynseg.config import Config, DataConfig, InferConfig, ModelConfig, SchedulerConfig, TrainConfig
from dynseg.export import ExportedPredictor, export_predictor
from dynseg.models.dilated import build_model
from dynseg.serve import ServingEngine, make_server


def _cfg():
    return Config(
        model=ModelConfig(net_type="dilated_grsl", num_classes=3,
                          num_input_bands=3, width_multiplier=0.125),
        sched=SchedulerConfig(distribution_type="multi_fixed", values=(9, 13)),
        train=TrainConfig(batch_size=4, seed=0),
        infer=InferConfig(scales=(9, 13), window_batch=16, dense_halo=20),
        data=DataConfig(dataset="synthetic"),
    )


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    cfg = _cfg()
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(5),
                           jnp.zeros((1, 9, 9, 3), jnp.float32), train=False)
    mean = np.array([100.0, 110.0, 120.0], np.float32)
    std = np.array([40.0, 41.0, 42.0], np.float32)
    out = tmp_path_factory.mktemp("serve_export")
    export_predictor(cfg, variables, mean, std, str(out), platforms=("cpu",),
                     extra_meta={"dataset": "synthetic"})
    return cfg, model, variables, mean, std, str(out)


def test_window_voting_matches_inferencer(served, rng):
    """ServingEngine (host numpy around artifact calls) and Inferencer
    (on-device overlap-add) implement the same estimator — probabilities
    must agree to float tolerance."""
    from dynseg.data.tiles import IGNORE_LABEL, TileSet
    from dynseg.infer import Inferencer

    cfg, model, variables, mean, std, out = served
    h = w = 24
    img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    tiles = TileSet(
        images=img[None],
        masks=np.zeros((1, h, w), np.int32),
        valid_hw=np.array([[h, w]], np.int32),
        mean=mean, std=std,
    )
    inf = Inferencer(cfg, tiles)
    pred_dev, prob_dev = inf.predict_tile(variables, 0, return_probs=True)

    eng = ServingEngine(ExportedPredictor.load(out), window_batch=16)
    labels, probs = eng.predict(img, mode="window")
    np.testing.assert_allclose(probs, prob_dev, atol=2e-4, rtol=1e-3)
    assert (labels == pred_dev).mean() > 0.995


def test_dense_mode_runs(served, rng):
    _, _, _, _, _, out = served
    eng = ServingEngine(ExportedPredictor.load(out))
    img = rng.uniform(0, 255, size=(30, 26, 3)).astype(np.float32)
    labels, probs = eng.predict(img, mode="dense")
    assert labels.shape == (30, 26) and probs.shape == (30, 26, 3)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_http_endpoints(served, rng):
    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=16)  # ephemeral port
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        hz = json.loads(urllib.request.urlopen(f"{base}/healthz").read())
        assert hz["status"] == "ok" and hz["num_classes"] == 3
        man = json.loads(urllib.request.urlopen(f"{base}/manifest").read())
        assert man["net_type"] == "dilated_grsl"

        img = rng.uniform(0, 255, size=(20, 20, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)

        def post(path, body, ctype):
            req = urllib.request.Request(
                f"{base}{path}", data=body,
                headers={"Content-Type": ctype}, method="POST")
            return urllib.request.urlopen(req)

        # labels as .npy
        r = post("/predict?mode=dense", buf.getvalue(), "application/x-npy")
        labels = np.load(io.BytesIO(r.read()))
        assert labels.shape == (20, 20) and labels.dtype == np.int32

        # probabilities
        r = post("/predict?mode=dense&output=probs", buf.getvalue(),
                 "application/x-npy")
        probs = np.load(io.BytesIO(r.read()))
        assert probs.shape == (20, 20, 3)
        np.testing.assert_array_equal(labels, probs.argmax(-1))

        # PNG input, PNG output (uses the manifest's training palette)
        from PIL import Image

        pbuf = io.BytesIO()
        Image.fromarray(img.astype(np.uint8)).save(pbuf, format="PNG")
        r = post("/predict?mode=window&scales=9&output=png",
                 pbuf.getvalue(), "image/png")
        assert r.headers["Content-Type"] == "image/png"
        rgb = np.asarray(Image.open(io.BytesIO(r.read())))
        assert rgb.shape == (20, 20, 3)
        # The colors must BE _encode_png's mapping of the same
        # request's labels — shape alone passed with any RGB image
        # (review r2, round 2).
        from dynseg.serve import _encode_png

        r2 = post("/predict?mode=window&scales=9", pbuf.getvalue(),
                  "image/png")
        labels_w = np.load(io.BytesIO(r2.read()))
        ref_rgb = np.asarray(Image.open(io.BytesIO(
            _encode_png(labels_w, "synthetic"))))
        np.testing.assert_array_equal(rgb, ref_rgb)
        assert len(np.unique(rgb.reshape(-1, 3), axis=0)) == \
            len(np.unique(labels_w))  # distinct classes keep distinct colors

        # malformed input -> 400 with an error message
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("/predict", b"garbage", "")
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()
        th.join(timeout=5)


def test_dense_blockwise_exact(served, rng):
    """Blockwise dense (halo'd fixed blocks) must equal the single
    whole-raster forward — and be block-size invariant. Requires the
    manifest halo >= the net's receptive-field radius (~27 for
    dilated_grsl), like Inferencer's dense mode."""
    cfg, model, variables, mean, std, out = served
    pred = ExportedPredictor.load(out)
    pred.manifest["inference"]["dense_halo"] = 32  # >= RF radius
    eng = ServingEngine(pred)
    h, w = 70, 61
    img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)

    p_small = eng.dense(img, block=16)
    p_big = eng.dense(img, block=1024)  # clamps to raster size: one block
    np.testing.assert_allclose(p_small, p_big, atol=1e-5, rtol=1e-4)

    # golden: whole mirror-padded forward through the live model
    halo = 32
    big = np.pad(img, ((halo, halo), (halo, halo), (0, 0)), mode="reflect")
    norm = (jnp.asarray(big[None]) - mean) / std
    ref = jax.nn.softmax(
        model.apply(variables, norm, train=False).astype(jnp.float32), -1
    )[0, halo:halo + h, halo:halo + w]
    np.testing.assert_allclose(p_small, np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_serve_dense_block_batch_invariant(served, rng):
    """dense_block_batch is a pure scheduling knob on the serving engine
    too (blocks stacked per artifact call — the exported dense program
    has a symbolic batch dim): every grouping, including the ragged
    final group, must produce the identical map."""
    cfg, model, variables, mean, std, out = served
    img = rng.uniform(0, 255, size=(70, 61, 3)).astype(np.float32)
    img8 = img.astype(np.uint8)
    ref_p = ref_l = None
    for bb in (1, 3, 8):  # 70x61 at block 16 = 20 blocks: ragged groups
        pred = ExportedPredictor.load(out)
        pred.manifest["inference"]["dense_halo"] = 32
        eng = ServingEngine(pred, dense_block=16, dense_block_batch=bb)
        p = eng.dense(img)
        l = eng.dense_labels(img8) if eng.p.has("dense_labels") else None
        if ref_p is None:
            ref_p, ref_l = p, l
        else:
            np.testing.assert_allclose(p, ref_p, atol=1e-6)
            if l is not None:
                np.testing.assert_array_equal(l, ref_l)


def test_mirror_pad_huge_halo(rng):
    """_mirror_pad must survive a halo larger than the raster (native
    np.pad applies repeated reflection for pad >= dim on numpy >= 2 —
    the convention the Inferencer uses)."""
    from dynseg.serve import _mirror_pad

    img = rng.uniform(size=(5, 4, 2)).astype(np.float32)
    out = _mirror_pad(img, 11)
    assert out.shape == (27, 26, 2)
    np.testing.assert_array_equal(out[11:16, 11:15], img)


def test_grayscale_single_band(tmp_path, rng):
    """A 1-band checkpoint must serve 2-D grayscale rasters (the engine
    adds the channel axis)."""
    cfg = Config(
        model=ModelConfig(net_type="dilated_grsl", num_classes=2,
                          num_input_bands=1, width_multiplier=0.125),
        sched=SchedulerConfig(distribution_type="single_fixed", values=(9,)),
        train=TrainConfig(batch_size=4, seed=0),
        infer=InferConfig(scales=(9,), window_batch=8, dense_halo=16),
        data=DataConfig(dataset="synthetic"),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(6),
                           jnp.zeros((1, 9, 9, 1), jnp.float32), train=False)
    export_predictor(cfg, variables, np.array([50.0], np.float32),
                     np.array([25.0], np.float32), str(tmp_path),
                     platforms=("cpu",))
    eng = ServingEngine(ExportedPredictor.load(str(tmp_path)), window_batch=8)
    img = rng.uniform(0, 255, size=(18, 20)).astype(np.float32)  # 2-D
    labels, probs = eng.predict(img, mode="window")
    assert labels.shape == (18, 20) and probs.shape == (18, 20, 2)


def test_cli_operation_serve_requires_export(tmp_path):
    from dynseg.cli import main as cli_main

    with pytest.raises(SystemExit, match="no export"):
        cli_main(["--operation", "serve", "--output_path", str(tmp_path)])


def test_degenerate_rasters_and_bad_params(served, rng):
    """Review regressions: 1-px-wide rasters must not hang padding, tiny
    rasters must survive dense blocking, malformed query params must come
    back as HTTP 400 (not a closed socket)."""
    from dynseg.serve import _mirror_pad

    # 1-pixel dimension: reflect impossible -> edge-pad, never spin
    thin = rng.uniform(size=(1, 6, 3)).astype(np.float32)
    out = _mirror_pad(thin, 4)
    assert out.shape == (9, 14, 3)

    _, _, _, _, _, outdir = served
    eng = ServingEngine(ExportedPredictor.load(outdir), window_batch=8)
    tiny = rng.uniform(0, 255, size=(5, 40, 3)).astype(np.float32)
    labels, probs = eng.predict(tiny, mode="dense")   # b clamps to 5
    assert labels.shape == (5, 40)

    srv = make_server(outdir, port=0, window_batch=8)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        buf = io.BytesIO()
        np.save(buf, tiny)
        req = urllib.request.Request(
            f"{base}/predict?scales=abc", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert "error" in json.loads(ei.value.read())
    finally:
        srv.shutdown()
        srv.server_close()
        th.join(timeout=5)


def test_uint8_routing_and_labels_fast_path(served, rng):
    """uint8 rasters route through the u8 artifact (same math, smaller
    upload) and the labels-only dense request takes the device-argmax
    fast path — all three must agree."""
    _, _, _, _, _, out = served
    eng = ServingEngine(ExportedPredictor.load(out), window_batch=8)
    img8 = rng.integers(0, 256, size=(26, 22, 3), dtype=np.uint8)

    # Spy on the artifact dispatch: equality of outputs alone is
    # vacuous — a regression that casts u8 to f32 up front produces
    # IDENTICAL outputs while killing the 4x-smaller-upload path
    # (review r2, round 2). Record the dtype of every artifact call.
    seen_dtypes = []
    orig_probs_device = eng.p.probs_device

    def spy(x):
        seen_dtypes.append(np.asarray(x).dtype)
        return orig_probs_device(x)

    eng.p.probs_device = spy
    labels_f, probs_f = eng.predict(img8.astype(np.float32), mode="dense")
    assert all(d == np.float32 for d in seen_dtypes), seen_dtypes
    seen_dtypes.clear()
    labels_8, probs_8 = eng.predict(img8, mode="dense")
    assert seen_dtypes and all(d == np.uint8 for d in seen_dtypes), \
        seen_dtypes  # u8 raster MUST ride the u8 entry point
    np.testing.assert_allclose(probs_8, probs_f, atol=1e-6)

    # labels-only request on uint8 input: device argmax, no probs download
    labels_fast, probs_none = eng.predict(img8, mode="dense",
                                          want_probs=False)
    assert probs_none is None
    np.testing.assert_array_equal(labels_fast, labels_8)

    # window voting also accepts uint8 input (and keeps it u8 on the
    # wire — same spy)
    seen_dtypes.clear()
    _, probs_w8 = eng.predict(img8, mode="window", scales=[9])
    assert seen_dtypes and all(d == np.uint8 for d in seen_dtypes), \
        seen_dtypes
    _, probs_wf = eng.predict(img8.astype(np.float32), mode="window",
                              scales=[9])
    np.testing.assert_allclose(probs_w8, probs_wf, atol=1e-6)


def test_warmup_covers_dense_batch_menu(served, rng):
    """warmup() must pre-compile EVERY (batch, dtype) shape the dense
    estimators can emit — _stack_group pads ragged groups to a power of
    two CAPPED at dense_block_batch, so a raster of any block count may
    dispatch batch sizes {1, 2, 4, ...} up to AND INCLUDING bb itself —
    a non-pow2 bb (here 6) runs every full group at exactly 6 (review
    r3: the pow2-only warmup loop missed it). An unseen batch size would
    stall a production request on a remote XLA compile (5-290s)."""
    from dynseg.serve import warmup

    _, _, _, _, _, out = served
    pred = ExportedPredictor.load(out)
    pred.manifest["inference"]["dense_halo"] = 4
    eng = ServingEngine(pred, dense_block=16, dense_block_batch=6,
                        window_batch=8)

    seen = set()
    for name in ("probs_device", "dense_labels_device"):
        if not eng.p.has("dense_labels") and name == "dense_labels_device":
            continue
        orig = getattr(eng.p, name)

        def spy(x, _orig=orig, _name=name):
            a = np.asarray(x)
            seen.add((_name, a.shape[0], a.shape[1], a.shape[2], a.dtype))
            return _orig(x)

        setattr(eng.p, name, spy)

    warmup(eng, size=16)
    warm = set(seen)
    # Rasters spanning group sizes 1..8 blocks (block 16): full groups
    # of 6 plus every ragged remainder the pow2 padding can produce.
    for w_blocks in range(1, 9):
        img = rng.integers(0, 256, size=(16, 16 * w_blocks, 3),
                           dtype=np.uint8)
        eng.dense(img)
        eng.dense(img.astype(np.float32))
        if eng.p.has("dense_labels"):
            eng.dense_labels(img)
    assert seen == warm, f"unseen shapes past warmup: {seen - warm}"


def test_warmup_and_sigterm_shutdown(served):
    """warmup() pre-compiles without error; SIGTERM drains the server
    cleanly (production shutdown path)."""
    import signal
    import time as _time

    from dynseg.serve import warmup

    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=8)
    warmup(srv.engine, size=24)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    assert json.loads(urllib.request.urlopen(f"{base}/healthz").read())[
        "status"] == "ok"
    # Exercise the REAL SIGTERM handler main() installs — calling
    # srv.shutdown() directly never tested the signal wiring (review r2,
    # round 2). Install the same handler main() does, then raise the
    # signal in-process.
    from dynseg.serve import _install_sigterm_handler

    prev = _install_sigterm_handler(srv)
    try:
        signal.raise_signal(signal.SIGTERM)
        th.join(timeout=10)
        assert not th.is_alive()
    finally:
        signal.signal(signal.SIGTERM, prev)
    srv.server_close()


def test_metrics_endpoint(served, rng):
    """/metrics exposes request counters and latency quantiles."""
    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=8)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        buf = io.BytesIO(); np.save(buf, img)
        for _ in range(2):
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/predict?mode=dense", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"},
                method="POST")).read()
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(urllib.request.Request(
                f"{base}/predict?scales=zz", data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"},
                method="POST"))
        m = json.loads(urllib.request.urlopen(f"{base}/metrics").read())
        assert m["uptime_s"] >= 0
        dense = m["modes"]["dense"]
        assert dense["requests"] == 2 and dense["errors"] == 0
        assert dense["pixels"] == 2 * 16 * 16
        assert dense["latency_s"]["p50"] > 0
        # the scales=zz parse error records under the default mode
        assert m["modes"]["window"]["errors"] == 1
    finally:
        srv.shutdown(); srv.server_close(); th.join(timeout=5)


def test_serve_tta_matches_manual_composition(served, rng):
    """?tta=1: the engine's dihedral fusion must equal manually averaging
    the 8 transform predictions (shared convention: dynseg.ops.dihedral)."""
    from dynseg.ops.dihedral import dihedral, dihedral_inv

    _, _, _, _, _, out = served
    eng = ServingEngine(ExportedPredictor.load(out), window_batch=8)
    img = rng.uniform(0, 255, size=(18, 14, 3)).astype(np.float32)
    labels, probs = eng.predict(img, mode="dense", tta=True)

    acc = None
    for k in range(8):
        p_k = eng.dense(np.ascontiguousarray(dihedral(img, k, np)))
        p_k = dihedral_inv(p_k, k, np)
        acc = p_k if acc is None else acc + p_k
    np.testing.assert_allclose(probs, acc / 8.0, atol=1e-6)
    np.testing.assert_array_equal(labels, (acc / 8.0).argmax(-1))


def test_request_size_cap(served, rng):
    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=8, max_request_mb=1)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        big = np.zeros((700, 700, 3), np.float32)  # ~5.9 MB > 1 MiB cap
        buf = io.BytesIO(); np.save(buf, big)
        req = urllib.request.Request(
            f"{base}/predict?mode=dense", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 413
    finally:
        srv.shutdown(); srv.server_close(); th.join(timeout=5)


def test_error_status_codes(served, rng):
    """ADVICE r1: malformed requests get 400 (with accepted options for a
    bad output=), while genuine server-side faults surface as 500 — not
    as client errors."""
    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=8)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    img = rng.uniform(0, 255, size=(16, 16, 3)).astype(np.float32)
    buf = io.BytesIO(); np.save(buf, img)

    def post(query):
        req = urllib.request.Request(
            f"{base}/predict?{query}", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"}, method="POST")
        return urllib.request.urlopen(req)

    try:
        # typo'd output => 400 listing the accepted values
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("mode=dense&output=prob")
        assert ei.value.code == 400
        assert "probs" in json.loads(ei.value.read())["error"]

        # malformed / non-positive scales => 400, not a 500 from deep
        # inside window_origins (review r2)
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("mode=window&scales=abc")
        assert ei.value.code == 400
        assert "scales" in json.loads(ei.value.read())["error"]
        with pytest.raises(urllib.error.HTTPError) as ei:
            post("mode=window&scales=0")
        assert ei.value.code == 400
        assert "positive" in json.loads(ei.value.read())["error"]

        # engine fault => 500 (previously masked as 400)
        orig = srv.engine.predict
        srv.engine.predict = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("artifact exploded"))
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                post("mode=dense")
            assert ei.value.code == 500
            assert "artifact exploded" in json.loads(ei.value.read())["error"]
        finally:
            srv.engine.predict = orig
        # server still healthy after the fault
        r = post("mode=dense")
        assert r.status == 200
    finally:
        srv.shutdown(); srv.server_close(); th.join(timeout=5)


def test_dos_guards(served, rng):
    """review r2 (round 2): three request-level DoS vectors —
    negative Content-Length (read-to-EOF bypassed the size cap), an
    unbounded client scales= value (O(max(scales)^2) host allocations),
    and an unbounded error-path body drain (now capped; the connection
    closes instead)."""
    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=8, max_request_mb=1)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    img = rng.uniform(0, 255, size=(12, 12, 3)).astype(np.float32)
    buf = io.BytesIO(); np.save(buf, img)
    try:
        # huge scales -> 400 BEFORE the body is decoded
        req = urllib.request.Request(
            f"{base}/predict?mode=window&scales=30000000",
            data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req)
        assert ei.value.code == 400
        assert "capped" in json.loads(ei.value.read())["error"]

        # negative Content-Length -> 400 (never rfile.read(-1))
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.server_port,
                                          timeout=10)
        conn.putrequest("POST", "/predict?mode=dense")
        conn.putheader("Content-Type", "application/x-npy")
        conn.putheader("Content-Length", "-1")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()

        # drain cap: the error-path body drain is bounded — a huge
        # declared body must leave bytes UNREAD (the old unbounded drain
        # sank the whole upload before the 413). Unit-level: the HTTP
        # server speaks per-request-close HTTP/1.0, so the cap is not
        # observable from a client socket.
        from dynseg.serve import _drain_capped

        class _CountingFile:
            def __init__(self, n):
                self.n, self.given = n, 0

            def read(self, k):
                k = min(k, self.n - self.given)
                self.given += k
                return b"\0" * k

        f = _CountingFile(100 << 20)  # 100 MiB declared
        left = _drain_capped(f, 100 << 20)
        assert f.given == 8 << 20 and left == (100 << 20) - (8 << 20)
        f = _CountingFile(2 << 20)  # small body: drained fully
        assert _drain_capped(f, 2 << 20) == 0 and f.given == 2 << 20

        # engine-level defense in depth for embedders
        from dynseg.serve import MAX_WINDOW_SCALE, ServingEngine
        from dynseg.export import ExportedPredictor

        eng = ServingEngine(ExportedPredictor.load(out), window_batch=8)
        with pytest.raises(ValueError, match=str(MAX_WINDOW_SCALE)):
            eng.window(img, scales=[MAX_WINDOW_SCALE + 1])
        with pytest.raises(ValueError, match="uint8"):
            eng.dense_labels(img)  # float raster must be refused
    finally:
        srv.shutdown(); srv.server_close(); th.join(timeout=5)


def test_mirror_pad_matches_numpy_native(rng):
    """review r2 (round 2): _mirror_pad must be EXACTLY np.pad reflect —
    the Inferencer's convention — including pad > dim (a stepped
    reimplementation diverged there, breaking serve-vs-device parity on
    tiny rasters with large halos)."""
    from dynseg.serve import _mirror_pad

    for h, w, pad in ((5, 4, 11), (2, 7, 9), (1, 6, 4), (3, 4, 3)):
        img = rng.uniform(size=(h, w, 2)).astype(np.float32)
        np.testing.assert_array_equal(
            _mirror_pad(img, pad),
            np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect"),
            err_msg=f"h={h} w={w} pad={pad}")


def test_server_stats_inflight_gauge():
    """The /metrics in-flight gauge: begin() raises it, record() lowers
    it (every do_POST exit path records exactly once), and it never goes
    negative on a spurious extra record."""
    from dynseg.serve import ServerStats

    st = ServerStats()
    assert st.snapshot()["inflight"] == 0
    st.begin()
    st.begin()
    assert st.snapshot()["inflight"] == 2
    st.record("dense", 0.1, 100)
    assert st.snapshot()["inflight"] == 1
    st.record("window", 0.1, 0, error=True)
    assert st.snapshot()["inflight"] == 0
    st.record("dense", 0.1, 100)  # unmatched record: clamps, not -1
    assert st.snapshot()["inflight"] == 0


def test_inflight_gauge_tracks_live_request(served):
    """Through the real HTTP server: the gauge reads >0 while a POST is
    being processed and returns to 0 after (the signal the load
    harness's SIGTERM phase gates on)."""
    import time

    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=16)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"

    def get_metrics():
        with urllib.request.urlopen(f"{base}/metrics", timeout=5) as r:
            return json.loads(r.read())

    try:
        assert get_metrics()["inflight"] == 0
        seen = []

        def one_post():
            img = np.zeros((48, 48, 3), np.float32)
            buf = io.BytesIO()
            np.save(buf, img)
            req = urllib.request.Request(
                f"{base}/predict?mode=dense&output=labels",
                data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"})
            with urllib.request.urlopen(req, timeout=120) as r:
                seen.append(r.status)

        t = threading.Thread(target=one_post)
        t.start()
        peak = 0
        for _ in range(500):
            peak = max(peak, get_metrics()["inflight"])
            if not t.is_alive():
                break
            time.sleep(0.01)
        t.join()
        assert seen == [200]
        assert peak >= 1, "gauge never observed the in-flight request"
        assert get_metrics()["inflight"] == 0
    finally:
        srv.shutdown()
        srv.server_close()


def test_sigterm_drain_completes_accepted_requests(served):
    """The drain must WAIT for in-flight handlers: ThreadingHTTPServer
    defaults daemon_threads=True and socketserver._Threads skips daemon
    threads, so server_close()'s join was a silent no-op — accepted
    requests died with the process (found by the r4 load harness once
    its SIGTERM was gauge-gated). make_server pins daemon_threads=False;
    this drives shutdown+close while a request is verifiably in flight
    and demands its 200."""
    import time

    _, _, _, _, _, out = served
    srv = make_server(out, port=0, window_batch=16)
    assert srv.daemon_threads is False
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    results = []

    def one_post():
        img = np.zeros((64, 64, 3), np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"{base}/predict?mode=dense&output=labels",
            data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"})
        try:
            with urllib.request.urlopen(req, timeout=120) as r:
                results.append(r.status)
        except Exception as e:  # noqa: BLE001 — the failure under test
            results.append(type(e).__name__)

    t = threading.Thread(target=one_post)
    t.start()
    # wait until the request is genuinely inside do_POST (the gauge)
    for _ in range(500):
        with urllib.request.urlopen(f"{base}/metrics", timeout=5) as r:
            if json.loads(r.read())["inflight"] > 0:
                break
        time.sleep(0.01)
    else:
        raise AssertionError("request never observed in flight")
    # the production SIGTERM path: shutdown off-thread, then close (join)
    threading.Thread(target=srv.shutdown).start()
    srv.server_close()
    t.join()
    assert results == [200], results


class _BlockingEngine:
    """Engine stand-in whose predict blocks until released — the
    platform's documented outage mode (chip visible, execution hangs for
    hours) in miniature."""

    def __init__(self, release: threading.Event):
        from types import SimpleNamespace

        self.release = release
        self.entered = threading.Event()
        self.p = SimpleNamespace(manifest={
            "net_type": "dilated_grsl", "num_classes": 3,
            "num_input_bands": 3, "dataset": "synthetic"})

    def predict(self, img, mode="window", scales=None, want_probs=True,
                tta=False):
        self.entered.set()
        self.release.wait()
        labels = np.zeros(img.shape[:2], np.int32)
        return labels, None


def _post_async(base, results, timeout=30):
    img = np.zeros((16, 16, 3), np.float32)
    buf = io.BytesIO()
    np.save(buf, img)
    req = urllib.request.Request(
        f"{base}/predict?mode=dense&output=labels", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"})

    def run():
        try:
            with urllib.request.urlopen(req, timeout=timeout) as r:
                results.append(r.status)
        except urllib.error.HTTPError as e:
            results.append(e.code)
        except Exception as e:  # noqa: BLE001 — the failure under test
            results.append(type(e).__name__)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return t


def test_request_deadline_503_and_wedged_metrics(tmp_path):
    """VERDICT r4 weak #2 / next #3: a device call that never returns
    must yield a 503 at the request deadline, and /metrics must
    distinguish wedged (stuck_device_calls > 0) from merely busy."""
    release = threading.Event()
    eng = _BlockingEngine(release)
    srv = make_server("unused", port=0, engine=eng, request_timeout_s=0.5)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        results = []
        t = _post_async(base, results)
        assert eng.entered.wait(10), "request never reached the engine"
        # while the call is within its deadline the server is BUSY, not
        # wedged
        snap = json.loads(urllib.request.urlopen(
            f"{base}/metrics", timeout=5).read())
        assert snap["inflight"] == 1 and not snap["wedged"]
        assert snap["oldest_inflight_s"] is not None
        t.join(timeout=30)
        assert results == [503], results
        snap = json.loads(urllib.request.urlopen(
            f"{base}/metrics", timeout=5).read())
        assert snap["deadline_expired"] == 1
        assert snap["stuck_device_calls"] == 1 and snap["wedged"]
        assert snap["inflight"] == 0  # the 503 left the gauge
        # device recovers: the abandoned worker finishes and the stuck
        # gauge returns to zero
        release.set()
        for _ in range(100):
            snap = json.loads(urllib.request.urlopen(
                f"{base}/metrics", timeout=5).read())
            if snap["stuck_device_calls"] == 0:
                break
            import time as _time
            _time.sleep(0.05)
        assert snap["stuck_device_calls"] == 0 and not snap["wedged"]
    finally:
        release.set()
        threading.Thread(target=srv.shutdown).start()
        srv.server_close()


def test_drain_grace_bounds_wedged_shutdown(tmp_path):
    """VERDICT r4 next #3: with the deadline DISABLED a wedged handler
    holds the in-flight gauge forever — drain() must give up after its
    grace and return 1 instead of joining forever (the r4
    daemon_threads=False fix made server_close an unbounded join)."""
    import time as _time

    from dynseg.serve import drain

    release = threading.Event()
    eng = _BlockingEngine(release)
    srv = make_server("unused", port=0, engine=eng, request_timeout_s=0)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        results = []
        _post_async(base, results, timeout=60)
        assert eng.entered.wait(10), "request never reached the engine"
        srv.shutdown()  # stop accepting, as the SIGTERM handler does
        msgs = []
        t0 = _time.monotonic()
        rc = drain(srv, grace_s=0.5, log=lambda *a, **k: msgs.append(a))
        took = _time.monotonic() - t0
        assert rc == 1, "drain must report the expired grace"
        assert took < 10, f"drain took {took}s — not bounded"
        assert any("grace" in str(m) for m in msgs)
    finally:
        release.set()
        srv.server_close()


def test_drain_clean_path_returns_zero(tmp_path):
    """drain() on an idle server closes it and returns 0 (the healthy
    production path main() now routes through)."""
    from dynseg.serve import drain

    release = threading.Event()
    release.set()  # engine never blocks
    srv = make_server("unused", port=0, engine=_BlockingEngine(release),
                      request_timeout_s=5)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    srv.shutdown()
    assert drain(srv, grace_s=5, log=lambda *a, **k: None) == 0


def test_stalled_client_gets_408_and_frees_handler(tmp_path):
    """ADVICE r4 medium: a client that sends headers but never completes
    its body must not pin a handler thread forever — the socket timeout
    aborts the read, the server answers 408 (best-effort), and the
    in-flight gauge returns to zero so the drain stays bounded."""
    import socket
    import time as _time

    release = threading.Event()
    release.set()
    srv = make_server("unused", port=0, engine=_BlockingEngine(release),
                      request_timeout_s=0, socket_timeout_s=0.5)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        s = socket.create_connection(("127.0.0.1", srv.server_port),
                                     timeout=10)
        s.sendall(b"POST /predict?mode=dense HTTP/1.1\r\n"
                  b"Host: x\r\nContent-Type: application/x-npy\r\n"
                  b"Content-Length: 1000000\r\n\r\npartial")
        # ... and never send the rest. The server must abort the read at
        # the socket timeout and record the request.
        s.settimeout(10)
        data = b""
        try:
            while True:
                chunk = s.recv(4096)
                if not chunk:
                    break
                data += chunk
        except socket.timeout:
            pass
        assert b"408" in data.split(b"\r\n")[0] or data == b"", data[:100]
        for _ in range(100):
            snap = json.loads(urllib.request.urlopen(
                f"{base}/metrics", timeout=5).read())
            if snap["inflight"] == 0 and snap["modes"]:
                break
            _time.sleep(0.05)
        assert snap["inflight"] == 0
        assert snap["modes"]["dense"]["errors"] == 1
        s.close()
    finally:
        threading.Thread(target=srv.shutdown).start()
        srv.server_close()


def test_cross_batch_results_match_unbatched(served, rng):
    """Cross-request dynamic batching is a pure launch-shape choice:
    dense()/dense_labels() through the batcher must equal the unbatched
    engine bit-for-bit, for float probs and the uint8 labels path."""
    _, _, _, _, _, out = served
    from dynseg.export import ExportedPredictor

    pred = ExportedPredictor.load(out)
    plain = ServingEngine(pred, dense_block=32, dense_block_batch=4)
    batched = ServingEngine(pred, dense_block=32, dense_block_batch=4,
                            cross_batch_ms=5.0)
    img = rng.integers(0, 255, (80, 70, 3), dtype=np.uint8)
    np.testing.assert_array_equal(plain.dense(img.astype(np.float32)),
                                  batched.dense(img.astype(np.float32)))
    np.testing.assert_array_equal(plain.dense_labels(img),
                                  batched.dense_labels(img))


def test_cross_batch_coalesces_concurrent_requests(served, rng):
    """Blocks from CONCURRENT single-block requests must ride one
    device call: with a generous linger window, N concurrent dense()
    calls of one block each produce fewer launches than blocks."""
    _, _, _, _, _, out = served
    from dynseg.export import ExportedPredictor

    pred = ExportedPredictor.load(out)
    calls = []
    orig = pred.probs_device

    def counting(x):
        calls.append(int(x.shape[0]))
        return orig(x)

    pred.probs_device = counting
    eng = ServingEngine(pred, dense_block=32, dense_block_batch=4,
                        cross_batch_ms=250.0)
    img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8
                       ).astype(np.float32)
    outs = [None] * 4
    ths = [threading.Thread(target=lambda i=i: outs.__setitem__(
        i, eng.dense(img))) for i in range(4)]
    for t in ths:
        t.start()
    for t in ths:
        t.join(timeout=60)
    assert all(o is not None for o in outs)
    # 4 requests x 1 block each: the 250ms linger must coalesce them
    # into fewer launches (typically 1) of batch > 1
    assert len(calls) < 4, calls
    assert max(calls) > 1, calls
    ref = ServingEngine(pred, dense_block=32).dense(img)
    for o in outs:
        np.testing.assert_array_equal(o, ref)
