"""One-command weight conversion: torch artifacts -> our .npz/param formats.

    python convert_weights.py ucnerf    pretrained_weights/ucnerf.tar    out.npz
    python convert_weights.py casmvsnet pretrained_weights/casmvsnet.ckpt out.npz
    python convert_weights.py lpips     <lpips_alex_state.pth>  pretrained_weights/lpips_alex.npz
    python convert_weights.py dpt       <dpt_hybrid_state.bin|transformers dir>  weights/dpt_hybrid.npz
    python convert_weights.py dpt_seg   <dpt_hybrid_ade20k_state.bin|dir>        weights/dpt_hybrid_seg.npz

Every converter here wraps a library function that is already
parity-tested (tests/test_reference_parity.py, test_lpips_oracle.py,
test_dpt.py); this CLI only adds file plumbing.

Where each artifact comes from / goes to:
- ``ucnerf``:    the reference's training checkpoint
  (``train.py:404-413``); output loads with ``--ckpt out.npz`` (both nets).
- ``casmvsnet``: the published CasMVSNet weights the reference
  hard-downloads at model construction (``network/models.py:240-248``,
  stored as ``{'model': state_dict}``); output seeds ONLY the MVS tree of a
  run (``--ckpt out.npz``).  No-download alternative: ``--mvs_only``
  pretraining (see docs/MIGRATION.md).
- ``lpips``:     state dict of torch ``lpips.LPIPS(net='alex')``
  (reference ``utils/evaluation.py:84-87``).  Save it on any machine with
  the lpips package: ``torch.save(lpips.LPIPS(net='alex').state_dict(),
  'lpips_alex.pth')``.  The eval gate reports LPIPS=nan until this npz
  exists at ``pretrained_weights/lpips_alex.npz`` (or
  ``$UCNERF_LPIPS_WEIGHTS``).
- ``dpt`` / ``dpt_seg``: transformers ``DPTForDepthEstimation`` /
  ``DPTForSemanticSegmentation`` (hybrid) state dict — a ``.bin``/``.pth``
  torch file or a ``from_pretrained`` directory (reference
  ``preprocess/DPT/run_monodepth.py:53-61`` / ``run_segmentation.py``).
  Consumed by ``preprocess.py dpt|seg`` via ``$UCNERF_DPT_WEIGHTS`` /
  ``$UCNERF_DPT_SEG_WEIGHTS``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _load_torch_state(path: str):
    import torch
    if os.path.isdir(path):  # transformers from_pretrained directory
        for name in ("pytorch_model.bin", "model.pth", "model.bin"):
            p = os.path.join(path, name)
            if os.path.exists(p):
                path = p
                break
        else:
            raise FileNotFoundError(
                f"{path}: no pytorch_model.bin/model.pth inside")
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):      # a whole nn.Module was saved
        obj = obj.state_dict()
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
            for k, v in obj.items()}


def convert(kind: str, src: str, dst: str) -> str:
    from ucnerf_tpu.utils import checkpoint_io

    if kind in ("ucnerf", "casmvsnet"):
        params = checkpoint_io.convert_reference_checkpoint(src)
        if kind == "casmvsnet" and "mvs" not in params:
            raise ValueError(f"{src} is not a casmvsnet checkpoint")
        return checkpoint_io.save_params_npz(params, dst)

    if kind == "lpips":
        from ucnerf_tpu.eval.lpips import convert_lpips_torch
        return convert_lpips_torch(_load_torch_state(src), dst)

    if kind in ("dpt", "dpt_seg"):
        from ucnerf_tpu.models.dpt import convert_dpt_torch_state_dict
        params = convert_dpt_torch_state_dict(_load_torch_state(src))
        np.savez(dst, **params)
        return dst

    raise ValueError(f"unknown kind {kind!r}")


def main(argv=None):
    parser = argparse.ArgumentParser(
        "convert_weights",
        description="Convert torch weight artifacts to ucnerf_tpu formats.")
    parser.add_argument("kind",
                        choices=["ucnerf", "casmvsnet", "lpips", "dpt",
                                 "dpt_seg"])
    parser.add_argument("src", help="torch .tar/.ckpt/.pth/.bin file "
                        "(or a transformers directory for dpt/dpt_seg)")
    parser.add_argument("dst", help="output .npz path")
    args = parser.parse_args(argv)
    d = os.path.dirname(os.path.abspath(args.dst))
    os.makedirs(d, exist_ok=True)
    out = convert(args.kind, args.src, args.dst)
    print(f"wrote {out}")
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
