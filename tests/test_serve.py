"""serve.py: the pose->frame render server on the synthetic scene."""

import io
import json
import threading
import urllib.request

import numpy as np

SERVE_ARGS = ["--dataset_name", "synthetic", "--view_num", "4",
              "--N_samples", "9", "--batch_size", "80", "--patch_size", "4",
              "--patch_num", "4", "--n_depth_rays", "32", "--chunk", "256"]


def _tiny_renderer():
    import serve
    from ucnerf_tpu.config import parse_config
    cfg = parse_config(SERVE_ARGS)
    return serve.build_renderer(cfg)


def test_http_render_roundtrip():
    """GET /health + POST /render (npz and png) against a live server on an
    ephemeral port; the npz payload must equal a direct render exactly."""
    import serve

    renderer, meta = _tiny_renderer()
    srv = serve.make_http_server(renderer, meta, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=600) as r:
            health = json.loads(r.read())
        assert health["img_wh"] == [64, 32]
        c2w = health["example_c2w"]

        body = json.dumps({"c2w": c2w}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=body),
                timeout=600) as r:
            payload = r.read()
        data = np.load(io.BytesIO(payload))
        assert data["rgb"].shape == (32, 64, 3)
        assert data["depth"].shape == (32, 64)
        assert np.isfinite(data["rgb"]).all()

        rgb, depth, conf = renderer.render_np(np.asarray(c2w, np.float32))
        np.testing.assert_array_equal(data["rgb"], rgb)
        np.testing.assert_array_equal(data["depth"], depth)
        np.testing.assert_array_equal(data["confidence"], conf)

        body = json.dumps({"c2w": c2w, "format": "png"}).encode()
        with urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=body),
                timeout=600) as r:
            assert r.headers["Content-Type"] == "image/png"
            png = r.read()
        import imageio.v2 as imageio
        img = imageio.imread(io.BytesIO(png))
        np.testing.assert_array_equal(
            np.asarray(img)[..., :3],
            (np.clip(rgb, 0, 1) * 255).astype(np.uint8))

        # malformed request -> 400, not a dead server
        bad = json.dumps({"c2w": [[1, 2], [3, 4]]}).encode()
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=bad), timeout=600)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "4x4" in json.loads(e.read())["error"]
    finally:
        srv.shutdown()


def test_batch_mode_cli(tmp_path):
    """serve.py --requests file.jsonl renders each line to its out path;
    the pipelined (dispatch-ahead) fetch must not change the frames."""
    import serve

    renderer, meta = _tiny_renderer()
    reqs = tmp_path / "reqs.jsonl"
    out_npz = str(tmp_path / "f0.npz")
    out_png = str(tmp_path / "f1.png")
    with open(reqs, "w") as fh:
        fh.write(json.dumps({"c2w": meta["example_c2w"],
                             "out": out_npz}) + "\n")
        fh.write(json.dumps({"c2w": meta["example_c2w"],
                             "out": out_png}) + "\n")
    serve.main(["--requests", str(reqs)] + SERVE_ARGS)
    data = np.load(out_npz)
    assert data["rgb"].shape == (32, 64, 3)
    rgb, depth, conf = renderer.render_np(
        np.asarray(meta["example_c2w"], np.float32))
    np.testing.assert_array_equal(data["rgb"], rgb)
    np.testing.assert_array_equal(data["depth"], depth)
    np.testing.assert_array_equal(data["confidence"], conf)
    import imageio.v2 as imageio
    assert imageio.imread(out_png).shape[:2] == (32, 64)


def test_validate_request_failure_modes():
    """Every malformed payload raises ValueError/TypeError (mapped to HTTP
    400) instead of reaching the device."""
    import pytest
    import serve

    ok = np.eye(4).tolist()
    for bad in [{},                                   # missing c2w
                {"c2w": None},
                {"c2w": "not a matrix"},
                {"c2w": [[1, 2], [3, 4]]},            # wrong shape
                {"c2w": [[1] * 4] * 3},               # 3x4
                {"c2w": [[[1] * 4] * 4]},             # extra dim
                {"c2w": (np.eye(4) * np.nan).tolist()},   # non-finite
                {"c2w": ok, "format": "jpeg"}]:       # unknown format
        with pytest.raises((ValueError, TypeError)):
            serve.validate_request(bad)
    c2w, fmt = serve.validate_request({"c2w": ok})
    assert c2w.shape == (4, 4) and fmt == "npz"


def test_health_probe_reports_wedged_backend(monkeypatch):
    """GET /health must answer 503 when the backend hangs (axon tunnel
    gotcha #4) rather than hanging the health check; subsequent probes
    fail fast instead of stacking hung threads."""
    import time as _time
    import serve

    # healthy: the real probe round-trips through the device
    res = serve.probe_backend(timeout_s=60.0)
    assert res["ok"] and res["probe_ms"] >= 0

    class WedgedJax:
        @staticmethod
        def device_put(x):
            _time.sleep(0.6)

    monkeypatch.setattr(serve, "jax", WedgedJax)
    res = serve.probe_backend(timeout_s=0.2)
    assert not res["ok"] and "timed out" in res["error"]
    # fail-fast while the hung thread is still out there
    t0 = _time.perf_counter()
    res2 = serve.probe_backend(timeout_s=30.0)
    assert not res2["ok"] and "hung" in res2["error"]
    assert _time.perf_counter() - t0 < 0.3
    # once the slow probe eventually completes (transient stall, not a
    # wedge), health must recover instead of latching 503 forever
    hung_thread = serve._PROBE_HUNG[0]
    hung_thread.join(10.0)
    assert not hung_thread.is_alive()
    monkeypatch.undo()
    res3 = serve.probe_backend(timeout_s=60.0)
    assert res3["ok"], res3
    assert serve._PROBE_HUNG[0] is None

    # through HTTP: 503 when unhealthy, 200 when healthy again
    renderer, meta = _tiny_renderer()
    monkeypatch.setattr(
        serve, "probe_backend",
        lambda t: {"ok": False, "error": "backend probe timed out"})
    srv = serve.make_http_server(renderer, meta, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                   timeout=600)
            assert False, "expected HTTP 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert "timed out" in json.loads(e.read())["error"]
        monkeypatch.undo()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                    timeout=600) as r:
            h = json.loads(r.read())
        assert h["ok"] and "probe_ms" in h and h["img_wh"] == [64, 32]
    finally:
        srv.shutdown()


def test_concurrent_requests_serialize():
    """N concurrent POST /render clients: all succeed, all payloads exact,
    and the renderer never runs two device renders at once (single chip —
    cf. the CLAUDE.md two-process tunnel hazard)."""
    import serve

    renderer, meta = _tiny_renderer()
    in_flight = [0]
    peak = [0]
    lock = threading.Lock()
    real = renderer.render_np

    def counting(c2w):
        with lock:
            in_flight[0] += 1
            peak[0] = max(peak[0], in_flight[0])
        try:
            return real(c2w)
        finally:
            with lock:
                in_flight[0] -= 1
    renderer.render_np = counting

    srv = serve.make_http_server(renderer, meta, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    ref_rgb, _, _ = real(np.asarray(meta["example_c2w"], np.float32))
    body = json.dumps({"c2w": meta["example_c2w"]}).encode()
    results = [None] * 4

    def client(i):
        with urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/render", data=body),
                timeout=600) as r:
            results[i] = r.read()
    try:
        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join(600)
        assert all(r is not None for r in results)
        for r in results:
            data = np.load(io.BytesIO(r))
            np.testing.assert_array_equal(data["rgb"], ref_rgb)
        assert peak[0] == 1, f"renders interleaved (peak={peak[0]})"
    finally:
        srv.shutdown()


def test_batch_mode_survives_malformed_lines(tmp_path, capsys):
    """A bad line in a batch file reports an error line and the rest of
    the batch still renders."""
    import serve

    renderer, meta = _tiny_renderer()
    out_ok = str(tmp_path / "good.npz")
    lines = [
        "{not json",
        json.dumps({"c2w": meta["example_c2w"]}),                # no out
        json.dumps({"c2w": [[1, 2]], "out": str(tmp_path / "x.npz")}),
        json.dumps({"c2w": meta["example_c2w"], "out": out_ok}),
    ]
    n = serve.run_batch(renderer, lines)
    assert n == 1
    outs = [json.loads(s) for s in
            capsys.readouterr().out.strip().splitlines()]
    errors = [o for o in outs if "error" in o]
    assert len(errors) == 3
    assert any("out" in e["error"] for e in errors)
    assert any("4x4" in e["error"] for e in errors)
    data = np.load(out_ok)
    assert data["rgb"].shape == (32, 64, 3)
