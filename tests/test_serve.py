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
