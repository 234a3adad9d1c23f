"""Load-test the HTTP serving layer (VERDICT r3 #6).

scripts/bench_serve.py drives the ServingEngine single-client and
socketless; this harness drives the REAL server (`python -m dynseg.serve`
in a subprocess, its production wiring: ThreadingHTTPServer + warmup +
request cap + SIGTERM drain) with N concurrent posters and mixed raster
sizes, and measures what an operator actually deploys:

  phase A  sustained multi-client throughput (Mpx/s aggregate) and
           per-size P50/P99 request latency over --duration seconds
  phase B  request-size cap under load: an oversize body must get 413
           while the server keeps serving others
  phase C  SIGTERM drain under load: every request in flight at signal
           time must complete 200, new connections must be refused, and
           the process must exit 0 within --drain_timeout

The reference has no serving layer at all (SURVEY.md §5) — this is
beyond-reference surface held to a production bar, per VERDICT r3.

Usage:
    python scripts/bench_serve_load.py [--clients 4] [--duration 45]
        [--sizes 512,768,1024] [--out docs/serve_load.json]
        [--export_dir <existing export>]   # else a random-init full-width
                                           # artifact is exported first
"""

import argparse
import io
import json
import os
import signal
import socket
import statistics
import subprocess
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_artifact(out_dir: str, compute_dtype: str,
                   width_multiplier: float = 1.0) -> str:
    """Random-init full-width artifact (throughput rig — same approach as
    scripts/bench_serve.py; accuracy provenance lives in the trained
    bench leg / ablations, not here)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dynseg.config import (Config, DataConfig, InferConfig, ModelConfig,
                               SchedulerConfig, TrainConfig)
    from dynseg.export import export_predictor
    from dynseg.models.dilated import build_model

    scales = (25, 35, 45, 55, 65)
    cfg = Config(
        model=ModelConfig(net_type="dilated_icpr_rate6", num_classes=6,
                          num_input_bands=3, compute_dtype=compute_dtype,
                          width_multiplier=width_multiplier),
        sched=SchedulerConfig(values=scales),
        train=TrainConfig(batch_size=4),
        infer=InferConfig(scales=scales),
        data=DataConfig(dataset="synthetic"),
    )
    model = build_model(cfg.model)
    variables = model.init(jax.random.key(0),
                           jnp.zeros((1, 25, 25, 3)), train=False)
    export_predictor(cfg, variables, np.zeros(3, np.float32),
                     np.ones(3, np.float32), out_dir, platforms=("tpu", "cpu"))
    return out_dir


def npy_bytes(arr) -> bytes:
    import numpy as np

    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def post(port: int, body: bytes, query: str, timeout: float = 300.0):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/predict?{query}", data=body,
        headers={"Content-Type": "application/octet-stream"})
    t0 = time.monotonic()
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            r.read()
            return r.status, time.monotonic() - t0
    except urllib.error.HTTPError as e:
        e.read()
        return e.code, time.monotonic() - t0


def wait_healthy(port: int, deadline_s: float) -> None:
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:  # noqa: BLE001 — still warming up
            time.sleep(2)
    raise RuntimeError(f"server not healthy after {deadline_s}s")


def pctl(xs, q):
    if not xs:
        return None
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, round(q * (len(xs) - 1))))
    return xs[i]


def main() -> int:
    import numpy as np

    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=4)
    ap.add_argument("--duration", type=float, default=45.0)
    ap.add_argument("--sizes", default="512,768,1024")
    ap.add_argument("--mode", default="dense", choices=["dense", "window"])
    ap.add_argument("--dense_block", type=int, default=512)
    ap.add_argument("--max_request_mb", type=int, default=8)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--width_multiplier", type=float, default=1.0,
                    help="narrow model for CPU smoke runs")
    ap.add_argument("--export_dir", default="")
    ap.add_argument("--port", type=int, default=8437)
    ap.add_argument("--warmup_deadline", type=float, default=600.0)
    ap.add_argument("--drain_timeout", type=float, default=120.0)
    ap.add_argument("--cross_batch_ms", type=float, default=0.0,
                    help="forwarded to the server: cross-request dynamic "
                         "batching linger (the r5 aggregate-throughput "
                         "lever for concurrent single-block clients)")
    ap.add_argument("--out", default="docs/serve_load.json")
    ap.add_argument("--platform", default="")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    tmp = None
    export_dir = args.export_dir
    if not export_dir:
        if args.platform:
            import jax

            jax.config.update("jax_platforms", args.platform)
        from dynseg.cli import enable_compilation_cache

        enable_compilation_cache()
        tmp = tempfile.TemporaryDirectory()
        export_dir = build_artifact(
            os.path.join(tmp.name, "export"), args.compute_dtype,
            args.width_multiplier)

    # server log to a FILE, not a pipe: a filled 64 KiB pipe buffer would
    # block the server mid-request and read as a mystery stall
    srv_log = tempfile.NamedTemporaryFile(
        mode="w+", suffix=".serve.log", delete=False)
    srv = subprocess.Popen(
        [sys.executable, "-m", "dynseg.serve",
         "--export_dir", export_dir, "--port", str(args.port),
         "--dense_block", str(args.dense_block),
         "--max_request_mb", str(args.max_request_mb),
         # warm only the load shapes; the default menu warms sizes this
         # harness never posts
         "--warmup_size", str(max(sizes))]
        + (["--cross_batch_ms", str(args.cross_batch_ms)]
           if args.cross_batch_ms > 0 else [])
        # --platform, not JAX_PLATFORMS: the axon sitecustomize ignores
        # the env var (that bug cost the first smoke run its 600 s)
        + (["--platform", args.platform] if args.platform else []),
        stdout=srv_log, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    payload = {
        "clients": args.clients, "duration_s": args.duration,
        "sizes": sizes, "mode": args.mode,
        "dense_block": args.dense_block,
        "cross_batch_ms": args.cross_batch_ms,
        "compute_dtype": args.compute_dtype,
        "max_request_mb": args.max_request_mb,
    }
    try:
        try:
            wait_healthy(args.port, args.warmup_deadline)
        except RuntimeError:
            payload["error"] = f"server not healthy after {args.warmup_deadline}s"
            raise
        rng = np.random.default_rng(0)
        bodies = {s: npy_bytes(rng.integers(0, 255, (s, s, 3), dtype=np.uint8))
                  for s in sizes}
        query = f"mode={args.mode}&output=labels"

        # ---- phase A: sustained concurrent load -------------------------
        results = []  # (size, status, latency)
        stop = threading.Event()

        def client(idx: int):
            i = idx  # stagger the size mix across clients
            while not stop.is_set():
                s = sizes[i % len(sizes)]
                i += 1
                code, dt = post(args.port, bodies[s], query)
                results.append((s, code, dt))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(args.clients)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        time.sleep(args.duration)
        stop.set()
        for t in threads:
            t.join()
        wall = time.monotonic() - t0
        ok = [(s, dt) for s, code, dt in results if code == 200]
        errs = [code for _, code, _ in results if code != 200]
        mpx = sum(s * s for s, _ in ok) / 1e6
        per_size = {}
        for s in sizes:
            lats = [dt for sz, dt in ok if sz == s]
            per_size[str(s)] = {
                "n": len(lats),
                "p50_s": round(pctl(lats, 0.50), 3) if lats else None,
                "p99_s": round(pctl(lats, 0.99), 3) if lats else None,
                "max_s": round(max(lats), 3) if lats else None,
            }
        payload["phase_a"] = {
            "requests_ok": len(ok), "errors": errs,
            "wall_s": round(wall, 1),
            "aggregate_mpx_per_s": round(mpx / wall, 3),
            "latency_by_size": per_size,
        }
        print(f"[A] {len(ok)} ok / {len(errs)} errors, "
              f"{mpx / wall:.2f} Mpx/s aggregate", flush=True)

        # ---- phase B: oversize body under load --------------------------
        big = b"\x00" * (args.max_request_mb * (1 << 20) + 1024)
        bg_stop = threading.Event()
        bg_codes = []

        def bg_client():
            while not bg_stop.is_set():
                bg_codes.append(post(args.port, bodies[sizes[0]], query)[0])

        bg = threading.Thread(target=bg_client)
        bg.start()
        cap_code, _ = post(args.port, big, query)
        after_code, _ = post(args.port, bodies[sizes[0]], query)
        bg_stop.set()
        bg.join()
        payload["phase_b"] = {
            "oversize_status": cap_code,
            "next_request_status": after_code,
            "concurrent_ok": bg_codes.count(200),
            "concurrent_errors": [c for c in bg_codes if c != 200],
        }
        print(f"[B] oversize -> {cap_code}, next -> {after_code}, "
              f"{bg_codes.count(200)} concurrent ok", flush=True)

        # ---- phase C: SIGTERM drain under load --------------------------
        inflight = []

        def one_shot(i):
            try:
                inflight.append(post(args.port, bodies[sizes[-1]], query))
            except Exception as e:  # noqa: BLE001 — a post still in the
                # listen backlog at SIGTERM gets its connection reset;
                # record it rather than killing the thread (only requests
                # the server ACCEPTED are owed a 200 by the drain)
                inflight.append(("conn_error: " + type(e).__name__, 0.0))

        shooters = [threading.Thread(target=one_shot, args=(i,))
                    for i in range(args.clients)]
        for t in shooters:
            t.start()
        # Gate the SIGTERM on the server's OWN in-flight gauge
        # (GET /metrics "inflight") instead of a fixed sleep: on a busy
        # 1-vCPU host a post-then-sleep window raced the accept loop —
        # both posts still in the LISTEN backlog at signal time are owed
        # nothing by the drain, so the phase verified nothing (measured:
        # 0-accepted runs flagged as failures). Poll until at least one
        # request is genuinely being processed; 10 s fallback keeps the
        # phase bounded if /metrics itself queues behind the posts.
        inflight_seen = 0
        t_gate = time.monotonic()
        while time.monotonic() - t_gate < 10.0:
            try:
                with urllib.request.urlopen(
                        f"http://127.0.0.1:{args.port}/metrics",
                        timeout=3) as r:
                    inflight_seen = int(
                        json.loads(r.read()).get("inflight", 0))
            except Exception:  # noqa: BLE001 — server busy; keep polling
                pass
            if inflight_seen > 0:
                break
            time.sleep(0.05)
        srv.send_signal(signal.SIGTERM)
        for t in shooters:
            t.join()
        drained = [code for code, _ in inflight]
        accepted = [c for c in drained if isinstance(c, int)]
        # after drain: new connections must be refused
        refused = False
        try:
            t_end = time.monotonic() + args.drain_timeout
            while time.monotonic() < t_end:
                try:
                    post(args.port, bodies[sizes[0]], query, timeout=5)
                except (urllib.error.URLError, socket.timeout, OSError):
                    refused = True
                    break
                time.sleep(1)
        except Exception:  # noqa: BLE001
            refused = True
        rc = srv.wait(timeout=args.drain_timeout)
        payload["phase_c"] = {
            "inflight_gauge_at_sigterm": inflight_seen,
            "inflight_statuses": drained,
            "inflight_all_200": (bool(accepted)
                                 and all(c == 200 for c in accepted)),
            "new_connection_refused": refused,
            "server_exit_code": rc,
        }
        print(f"[C] in-flight {drained}, refused={refused}, exit={rc}",
              flush=True)
    finally:
        if srv.poll() is None:
            srv.kill()
            srv.wait(timeout=30)
        srv_log.flush()
        with open(srv_log.name) as f:
            payload["server_log_tail"] = f.read()[-3000:].splitlines()[-15:]
        os.unlink(srv_log.name)
        if tmp is not None:
            tmp.cleanup()
        # Write the payload on EVERY exit path — a failed run's server
        # log tail is exactly what debugging needs.
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=2)
        print(f"wrote {args.out}")
    ok_all = (not payload.get("phase_a", {}).get("errors")
              and payload.get("phase_b", {}).get("oversize_status") == 413
              and payload.get("phase_c", {}).get("inflight_all_200")
              and payload.get("phase_c", {}).get("server_exit_code") == 0)
    print("PASS" if ok_all else "CHECK FAILURES ABOVE")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
