"""Pose -> frame render server (the production serving surface).

Holds one scene's source views, checkpoint, and cached FeatureNet
features device-resident (``ucnerf_tpu/render/serving.py``) and renders
novel views on demand.  The reference has no serving surface — its
closest analogue is re-running ``validation_step`` per view
(``train.py:213-324``), which rebuilds everything each time; this serves
the measured steady-state path (BASELINE.md: 281 ms/frame at 320x256 on
one v5e chip; multi-chip via ``--mesh_shape``).

HTTP mode:

    python serve.py --preset eval_scared --datadir <path> --ckpt <ckpt> \
        --port 8080
    curl -s localhost:8080/health
    curl -s -X POST --data-binary @req.json \
        localhost:8080/render > frame.npz     # req.json: {"c2w": 4x4 list}

Batch mode (JSON-lines requests from a file or stdin, used by tests):

    python serve.py ... --requests reqs.jsonl
    # each line: {"c2w": [[...]], "out": "frame_001.npz"}

File-input batches pipeline dispatch-ahead (BASELINE.md: 300.9 vs
395-423 ms/frame synchronous on v5e); the per-request "ms" lines then
overlap each other — the final ``{"frames", "wall_ms", "ms_per_frame"}``
line is the throughput number.

Request fields: ``c2w`` (4x4 camera-to-world, same convention as the
dataset poses), optional ``format`` "npz" (rgb f32 + depth f32 +
confidence f32) or "png" (rgb only).  Single in-flight render by design
(one chip / one mesh); concurrent HTTP requests queue in the listener.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time

import numpy as np

from ucnerf_tpu.utils.platform import (enable_compile_cache,
                                       honor_jax_platforms_env)

honor_jax_platforms_env()  # an explicit JAX_PLATFORMS env var wins
enable_compile_cache()     # persistent compile cache (env var overrides)

import jax

from ucnerf_tpu.config import parse_config
from ucnerf_tpu.data import build_dataset
from ucnerf_tpu.models.factory import create_models, init_params
from ucnerf_tpu.render.serving import ServingRenderer
from ucnerf_tpu.utils import checkpoint_io


def build_renderer(cfg, scene_idx: int = 0):
    """Dataset + models + checkpoint -> (ServingRenderer, metadata)."""
    ds = build_dataset(cfg, "val")
    H, W = ds.img_wh[1], ds.img_wh[0]
    nerf, mvs = create_models(cfg)
    params = checkpoint_io.load_eval_params(
        cfg, init_params(cfg, jax.random.PRNGKey(cfg.seed), (H, W)))
    sample = ds[scene_idx]
    scan = ds.metas[scene_idx][0]
    renderer = ServingRenderer(cfg, nerf, mvs, params, sample, (H, W),
                               ds.scene[scan]["intrinsic"])
    meta = {"scan": str(scan), "img_wh": [W, H], "view_num": cfg.view_num,
            "N_samples": cfg.N_samples, "chunk": cfg.chunk,
            "mesh_shape": list(cfg.mesh_shape),
            "device": str(jax.devices()[0]),
            "example_c2w": np.asarray(sample["c2ws"][0]).tolist()}
    return renderer, meta


def encode_frame(rgb, depth, conf, fmt: str) -> tuple:
    """(payload bytes, content-type) for a rendered frame."""
    if fmt == "png":
        import imageio.v2 as imageio
        buf = io.BytesIO()
        imageio.imwrite(buf, (np.clip(rgb, 0, 1) * 255).astype(np.uint8),
                        format="png")
        return buf.getvalue(), "image/png"
    buf = io.BytesIO()
    np.savez(buf, rgb=rgb, depth=depth, confidence=conf)
    return buf.getvalue(), "application/octet-stream"


def validate_request(req: dict) -> tuple:
    """Request dict -> (c2w [4,4] f32, fmt).  Raises ValueError on
    malformed requests (the HTTP layer maps it to 400)."""
    c2w = np.asarray(req.get("c2w", None), dtype=np.float32)
    if c2w.shape != (4, 4):
        raise ValueError(f"'c2w' must be a 4x4 matrix, got {c2w.shape}")
    if not np.isfinite(c2w).all():
        raise ValueError("'c2w' contains non-finite values")
    fmt = req.get("format", "npz")
    if fmt not in ("npz", "png"):
        raise ValueError(f"unknown format {fmt!r} (npz|png)")
    return c2w, fmt


def handle_render(renderer: ServingRenderer, req: dict) -> tuple:
    """Validate one request dict and render it -> (payload, content_type)."""
    c2w, fmt = validate_request(req)
    rgb, depth, conf = renderer.render_np(c2w)
    return encode_frame(rgb, depth, conf, fmt)


_PROBE_HUNG = [None]    # the last timed-out probe Thread (None = healthy)


def probe_backend(timeout_s: float = 10.0) -> dict:
    """Round-trip a tiny value through the device on a worker thread.

    The axon tunnel can wedge mid-session with device ops hanging forever
    (CLAUDE.md gotcha #4) — ``join(timeout)`` turns that into an unhealthy
    report instead of a hung /health.  While a timed-out probe thread is
    still alive (daemon, unjoinable by design), later probes fail fast
    instead of stacking more hung threads; once it eventually finishes
    (a transiently slow round-trip, not a wedge) the backend reports
    healthy again rather than latching 503 forever."""
    hung = _PROBE_HUNG[0]
    if hung is not None:
        if hung.is_alive():
            return {"ok": False, "error":
                    "previous backend probe still hung; backend wedged"}
        _PROBE_HUNG[0] = None      # the stuck probe completed -> recovered
    import threading
    result = {}

    def work():
        try:
            t0 = time.perf_counter()
            # device_put + host fetch exercises the full transfer path
            result["value"] = float(jax.device_put(np.float32(2.0)))
            result["ms"] = (time.perf_counter() - t0) * 1e3
        except Exception as e:        # surfaced as unhealthy, not a crash
            result["error"] = f"{type(e).__name__}: {e}"

    th = threading.Thread(target=work, daemon=True)
    th.start()
    th.join(timeout_s)
    if th.is_alive():
        _PROBE_HUNG[0] = th
        return {"ok": False,
                "error": f"backend probe timed out after {timeout_s}s"}
    if "error" in result:
        return {"ok": False, "error": result["error"]}
    return {"ok": True, "probe_ms": round(result["ms"], 1)}


def make_http_server(renderer, meta, host: str = "127.0.0.1",
                     port: int = 8080, probe_timeout: float = 10.0):
    """A single-threaded stdlib HTTP server bound to (host, port); port 0
    picks an ephemeral port (tests).  Caller runs .serve_forever().

    Requests are handled one at a time (single listener thread) AND the
    render itself is behind a lock — concurrent clients serialize rather
    than interleave device work (two in-flight renders on one chip corrupt
    both measurements and fight for HBM; cf. the CLAUDE.md two-process
    tunnel hazard).  GET /health actively probes the backend with a
    timeout, so a wedged tunnel reports 503 instead of hanging the check.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    render_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path.split("?")[0] == "/health":
                probe = probe_backend(probe_timeout)
                body = json.dumps({**meta, **probe}).encode()
                self._send(200 if probe["ok"] else 503, body,
                           "application/json")
            else:
                self._send(404, b'{"error": "use GET /health or POST '
                                b'/render"}', "application/json")

        def do_POST(self):
            if self.path != "/render":
                self._send(404, b'{"error": "POST /render"}',
                           "application/json")
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                t0 = time.perf_counter()
                with render_lock:
                    payload, ctype = handle_render(renderer, req)
                self.log_message("rendered in %.0f ms",
                                 (time.perf_counter() - t0) * 1e3)
                self._send(200, payload, ctype)
            except (ValueError, TypeError, KeyError,
                    json.JSONDecodeError) as e:
                self._send(400, json.dumps({"error": str(e)}).encode(),
                           "application/json")

        def log_message(self, fmt, *args):  # quiet-able stdlib default
            sys.stderr.write("serve.py: " + fmt % args + "\n")

    return HTTPServer((host, port), Handler)


def run_batch(renderer, lines, pipeline: bool = True) -> int:
    """JSON-lines mode: render each request to its 'out' path.

    With ``pipeline`` (file input), request i+1 is DISPATCHED (device
    arrays, async) before request i's frame is fetched to the host — like
    render_path.py's trajectory loop — so the fetch + encode + file write
    of frame i overlap the device render of frame i+1 (the synchronous
    fetch costs ~120 ms/frame at 320x256 on v5e — see BASELINE.md).
    Streaming stdin disables it: holding frame i until line i+1 arrives
    would add one-request lag to an interactive producer."""
    n = 0
    pending = None  # (device (rgb, depth, conf), out path, fmt, t_dispatch)

    def flush(item):
        (rgb, depth, conf), out, fmt, t0 = item
        payload, _ = encode_frame(np.asarray(rgb), np.asarray(depth),
                                  np.asarray(conf), fmt)
        with open(out, "wb") as fh:
            fh.write(payload)
        print(json.dumps({"out": out,
                          "ms": round((time.perf_counter() - t0) * 1e3, 1)}))

    t_all = time.perf_counter()
    for line in lines:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
            if "out" not in req:
                raise ValueError("request missing 'out' path")
            out = req["out"]
            fmt = req.get("format",
                          "png" if str(out).endswith(".png") else "npz")
            c2w, fmt = validate_request(dict(req, format=fmt))
        except (ValueError, TypeError, json.JSONDecodeError) as e:
            # a malformed line must not kill the remaining batch
            print(json.dumps({"error": str(e), "line": line[:200]}))
            continue
        t0 = time.perf_counter()
        frame = renderer.render(c2w)  # async dispatch
        if pending is not None:
            flush(pending)
        if pipeline:
            pending = (frame, out, fmt, t0)
        else:
            flush((frame, out, fmt, t0))
        n += 1
    if pending is not None:
        flush(pending)
    if n:
        wall = time.perf_counter() - t_all
        print(json.dumps({"frames": n, "wall_ms": round(wall * 1e3, 1),
                          "ms_per_frame": round(wall * 1e3 / n, 1)}))
    return n


def main(argv=None):
    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--port", type=int, default=None,
                        help="HTTP mode: listen on this port (0=ephemeral)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--requests", default=None,
                        help="batch mode: JSON-lines request file, '-'=stdin")
    parser.add_argument("--scene_idx", type=int, default=0)
    parser.add_argument("--probe_timeout", type=float, default=10.0,
                        help="GET /health backend-probe timeout (s); a "
                        "wedged tunnel reports 503 instead of hanging")
    ns, rest = parser.parse_known_args(argv)
    if (ns.port is None) == (ns.requests is None):
        parser.error("exactly one of --port / --requests is required")
    cfg = parse_config(rest)

    renderer, meta = build_renderer(cfg, ns.scene_idx)
    # warm the compile before accepting traffic (first frame carries jit)
    t0 = time.perf_counter()
    renderer.render_np(np.asarray(renderer.sample["c2ws"][0]))
    print(f"serve.py: warmed up in {time.perf_counter() - t0:.1f}s; "
          f"scene {meta['scan']} at {meta['img_wh']} on {meta['device']}")

    if ns.requests is not None:
        lines = sys.stdin if ns.requests == "-" else open(ns.requests)
        n = run_batch(renderer, lines, pipeline=ns.requests != "-")
        print(f"serve.py: rendered {n} request(s)")
        return

    srv = make_http_server(renderer, meta, ns.host, ns.port,
                           probe_timeout=ns.probe_timeout)
    print(f"serve.py: listening on http://{srv.server_address[0]}:"
          f"{srv.server_address[1]} (GET /health, POST /render)")
    srv.serve_forever()


if __name__ == "__main__":
    main()
