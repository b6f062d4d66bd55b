"""Offline preprocessing CLI (reference ``preprocess/`` layer, SURVEY.md L0).

    python preprocess.py colmap <scene_dir> [--match sequential_matcher]
    python preprocess.py dpt <scene_dir> [--weights <path>]
    python preprocess.py seg <scene_dir> [--weights <path>]

``colmap``: SfM via the external COLMAP binary -> sparse/0 + poses_bounds.npy
(reference ``imgs2poses.py``).  ``dpt``: monocular depth prior ->
``dpt/<name>.npz{pred}`` per image (reference ``run_monodepth.py:98-130``),
using the JAX DPT-hybrid port in ``ucnerf_tpu.models.dpt`` with converted
weights (zero-egress environments must provide the weight file).
``seg``: ADE20K semantic segmentation -> ``seg/<name>.npz{labels}`` +
palette-blended ``seg/<name>.png`` (reference ``run_segmentation.py``,
shipped alongside the depth runner but unused by the UC-NeRF pipeline).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np

from ucnerf_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()  # an explicit JAX_PLATFORMS env var wins


def cmd_colmap(ns):
    from ucnerf_tpu.data.colmap_wrapper import imgs2poses
    imgs2poses(ns.scene_dir, ns.match)
    print(f"wrote {os.path.join(ns.scene_dir, 'poses_bounds.npy')}")


def cmd_dpt(ns):
    from ucnerf_tpu.models.dpt import load_dpt
    predict = load_dpt(ns.weights,
                       dtype="bfloat16" if ns.bf16 else None)
    out_dir = os.path.join(ns.scene_dir, "dpt")
    os.makedirs(out_dir, exist_ok=True)
    imgs = sorted(glob.glob(os.path.join(ns.scene_dir, "images/*")))
    from PIL import Image
    for p in imgs:
        img = np.asarray(Image.open(p), np.float32)[..., :3] / 255.0
        pred = predict(img)
        name = os.path.splitext(os.path.basename(p))[0]
        np.savez(os.path.join(out_dir, name + ".npz"), pred=pred)
        print(f"dpt: {name} ({pred.shape})")


def cmd_seg(ns):
    from ucnerf_tpu.models.dpt import load_dpt_seg
    from ucnerf_tpu.utils.viz import blend_segmentation
    predict = load_dpt_seg(ns.weights,
                           dtype="bfloat16" if ns.bf16 else None)
    out_dir = os.path.join(ns.scene_dir, "seg")
    os.makedirs(out_dir, exist_ok=True)
    imgs = sorted(glob.glob(os.path.join(ns.scene_dir, "images/*")))
    from PIL import Image
    for p in imgs:
        img = np.asarray(Image.open(p), np.float32)[..., :3] / 255.0
        labels, _ = predict(img)
        name = os.path.splitext(os.path.basename(p))[0]
        np.savez(os.path.join(out_dir, name + ".npz"), labels=labels)
        Image.fromarray(blend_segmentation(img, labels)).save(
            os.path.join(out_dir, name + ".png"))
        print(f"seg: {name} ({labels.shape}, "
              f"{len(np.unique(labels))} classes)")


def main(argv=None):
    parser = argparse.ArgumentParser("preprocess")
    sub = parser.add_subparsers(dest="cmd", required=True)
    pc = sub.add_parser("colmap")
    pc.add_argument("scene_dir")
    pc.add_argument("--match", default="exhaustive_matcher",
                    choices=["exhaustive_matcher", "sequential_matcher"])
    pc.set_defaults(fn=cmd_colmap)
    pd = sub.add_parser("dpt")
    pd.add_argument("scene_dir")
    pd.add_argument("--weights", default=None)
    pd.add_argument("--bf16", action="store_true",
                    help="reduced-precision inference (the TPU analogue of "
                         "the reference's fp16 CUDA DPT)")
    pd.set_defaults(fn=cmd_dpt)
    ps = sub.add_parser("seg")
    ps.add_argument("scene_dir")
    ps.add_argument("--weights", default=None)
    ps.add_argument("--bf16", action="store_true",
                    help="reduced-precision inference (the TPU analogue of "
                         "the reference's fp16 CUDA DPT)")
    ps.set_defaults(fn=cmd_seg)
    ns = parser.parse_args(argv)
    ns.fn(ns)


if __name__ == "__main__":
    main()
