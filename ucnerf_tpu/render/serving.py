"""Device-resident novel-view serving for a fixed source set.

The serving layout (BASELINE.md round-3, measured on v5e): a serving
process holds ONE scene's source views on device and answers pose ->
frame requests.  Three properties make it faster than naively re-running
the eval render per request (reference ``validation_step``,
``train.py:213-324``, rebuilds everything per view):

- the big sample leaves (images, DPT prior, sparse depth) upload ONCE and
  stay device-resident; each request ships only the ~KB pose matrices;
- the target-independent FeatureNet forward of the fixed source views is
  computed ONCE (``CascadeMVSNet.features``/``from_features`` split,
  bit-exact vs the stock forward — tested); per request only the
  warp/variance/CostRegNet remainder of the cascade reruns (the cost
  volume lives in the target view's NDC frame and must);
- ``render()`` returns device arrays, so a caller can dispatch request
  i+1 before fetching request i and overlap the host transfer with the
  device render (``render_path.py`` does; measured 284 -> 281 ms/frame).

Used by ``render_path.py`` (trajectory videos) and ``serve.py`` (the
HTTP / stdin render server).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ucnerf_tpu.config import Config
from ucnerf_tpu.data.base import build_affine_mats
from ucnerf_tpu.train.loop import make_eval_render, to_device_batch


class ServingRenderer:
    """Pose -> (rgb, depth, confidence) renderer over a fixed source set.

    ``sample`` is one dataset sample (its view 0 pose is replaced per
    request); ``img_hw`` the render resolution; ``intrinsic`` the target
    camera.  Multi-chip: if ``cfg.mesh_shape`` names >1 device the frame's
    pixel tiles shard over the full mesh (same render the validator uses).
    """

    def __init__(self, cfg: Config, nerf, mvs, params, sample,
                 img_hw: Tuple[int, int], intrinsic):
        H, W = img_hw
        self.cfg = cfg
        self.params = params
        self.sample = sample
        self.intrinsic = np.asarray(intrinsic, np.float32)
        self.img_hw = (H, W)
        self.base = to_device_batch(sample)

        src_feats = jax.jit(
            lambda p, imgs: mvs.apply({"params": p}, imgs,
                                      method="features"))(
            params["mvs"], self.base["images"][1:])

        def mvs_cached(params_mvs, imgs_src, aff, aff_inv, near, far, pad):
            del imgs_src  # features precomputed for the fixed source set
            return mvs.apply({"params": params_mvs}, src_feats, aff,
                             aff_inv, near, far, pad,
                             method="from_features")

        if int(np.prod(cfg.mesh_shape)) > 1:
            from ucnerf_tpu.parallel.mesh import make_mesh
            from ucnerf_tpu.parallel.sharding import make_parallel_eval_render
            mesh = make_mesh(tuple(cfg.mesh_shape), tuple(cfg.mesh_axes))
            self._render_view = make_parallel_eval_render(
                cfg, nerf, mvs, (H, W), mesh, axis=tuple(mesh.axis_names),
                mvs_apply=mvs_cached)
        else:
            self._render_view = make_eval_render(cfg, nerf, mvs, (H, W),
                                                 mvs_apply=mvs_cached)

    def frame_batch(self, c2w):
        """Device batch for a target pose: only the view-0 pose rows and
        the per-stage projection matrices change; every other leaf aliases
        the device-resident base upload."""
        c2w = np.asarray(c2w, np.float32)
        w2c = np.linalg.inv(c2w).astype(np.float32)
        aff, aff_inv = build_affine_mats(self.intrinsic, w2c)
        s = dict(self.base)
        for key, row in (("c2ws", c2w), ("w2cs", w2c),
                         ("affine_mat", aff), ("affine_mat_inv", aff_inv)):
            arr = np.asarray(self.sample[key]).copy()
            arr[0] = row
            s[key] = jnp.asarray(arr)
        return s

    def render(self, c2w):
        """Dispatch one frame; returns DEVICE arrays (rgb [H,W,3],
        depth [H,W], confidence) so callers can pipeline dispatch/fetch."""
        return self._render_view(self.params, self.frame_batch(c2w))

    def render_np(self, c2w):
        """Synchronous convenience: fetch to numpy."""
        rgb, depth, conf = self.render(c2w)
        return np.asarray(rgb), np.asarray(depth), np.asarray(conf)
