"""Checkpointing: orbax for native checkpoints + torch-checkpoint conversion.

Native format: orbax save of {params: {nerf, mvs}, opt_state, step} —
unlike the reference, optimizer state IS saved/restored (the reference
drops it, ``train.py:404-413`` / ``network/models.py:253-266``).

Torch conversion: maps the reference's ``ucnerf.tar``
({network_fn_state_dict, network_mvs_state_dict}) and the published
``casmvsnet.ckpt`` ({'model': ...}) state dicts onto our parameter trees so
pretrained weights can be evaluated for parity (SURVEY.md §7 step 3-4).
torch itself is imported lazily and only used host-side.
"""

from __future__ import annotations

import os
import re
from typing import Dict

import numpy as np

import jax


# ------------------------------------------------------------------ orbax
_CKPTR = None


def _checkpointer():
    """Process-wide StandardCheckpointer (an AsyncCheckpointer underneath).

    Reused across saves so periodic checkpoints commit in a background
    thread while training keeps dispatching; a fresh instance per save
    would serialize the directory finalize/rename on the host every time.
    """
    global _CKPTR
    if _CKPTR is None:
        import orbax.checkpoint as ocp
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def save_checkpoint(ckpt_dir: str, state, step: int, wait: bool = True,
                    keep: int = 0):
    """Save the full TrainState.  ``wait=False`` returns as soon as the
    host copy is snapshotted (np.asarray fetch) and lets orbax commit the
    files asynchronously — call ``wait_for_checkpoints()`` (or a final
    ``wait=True`` save) before reading the directory or exiting.

    ``keep > 0`` prunes the oldest ``step_*`` dirs so at most ``keep``
    remain after this save (0 = keep all, the reference's behavior —
    it never deletes its 5000-step ``.tar`` dumps, ``train.py:404-413``).
    Pruning happens BEFORE the new save is issued, after draining any
    in-flight async commit, so a half-written directory is never touched.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    ckptr = _checkpointer()
    if keep > 0:
        ckptr.wait_until_finished()       # never prune an in-flight commit
        old = sorted(d for d in os.listdir(ckpt_dir)
                     if re.fullmatch(r"step_\d{8}", d)
                     and os.path.isdir(os.path.join(ckpt_dir, d))
                     and os.path.abspath(os.path.join(ckpt_dir, d)) != path)
        import shutil
        for d in old[:max(0, len(old) - (keep - 1))]:
            shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)
    # force=True: overwrite an existing step dir (e.g. re-saving the resume
    # step) instead of raising
    ckptr.save(path, jax.tree.map(np.asarray, state._asdict()), force=True)
    if wait:
        ckptr.wait_until_finished()
    return path


def wait_for_checkpoints():
    """Block until every async ``save_checkpoint(..., wait=False)`` commit
    has finished (no-op if none are outstanding)."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def load_checkpoint(path: str, target_state):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.abspath(path),
                             jax.tree.map(np.asarray,
                                          target_state._asdict()))
    return type(target_state)(**restored)


def load_params(path: str, target_params):
    """Restore ONLY the ``params`` subtree of a saved TrainState.

    The cross-objective seed (``--ckpt_params_only``): an ``--mvs_only``
    boot checkpoint seeding a full run, or a full checkpoint seeding a
    ``--finetune`` refine.  A full ``load_checkpoint`` needs a target
    whose optimizer-state STRUCTURE matches the save — impossible across
    an objective change (plain adam saves a list-shaped opt_state, the
    finetune ``multi_transform`` expects a dict) — so this restores
    partially, touching nothing but the parameters."""
    import orbax.checkpoint as ocp
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            item={"params": jax.tree.map(np.asarray, target_params)},
            partial_restore=True))
    return restored["params"]


# ----------------------------------------------------- torch -> jax mapping
def _t2j_linear(sd, prefix):
    return {"Dense_0": {"kernel": sd[prefix + ".weight"].T,
                        "bias": sd[prefix + ".bias"]}}


def _t2j_conv(sd, prefix, spatial):
    """torch conv weight (Cout, Cin, *k) -> flax (*k, Cin, Cout)."""
    w = sd[prefix + ".weight"]
    perm = tuple(range(2, 2 + spatial)) + (1, 0)
    out = {"kernel": np.transpose(w, perm)}
    if prefix + ".bias" in sd:
        out["bias"] = sd[prefix + ".bias"]
    return out


def _t2j_convT(sd, prefix, spatial):
    """torch ConvTranspose weight (Cin, Cout, *k) -> ours (*k, Cout, Cin)."""
    w = sd[prefix + ".weight"]
    perm = tuple(range(2, 2 + spatial)) + (1, 0)
    return {"kernel": np.transpose(w, perm)}


def _t2j_bn(sd, prefix):
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if "model" in obj:                       # casmvsnet.ckpt
        obj = obj["model"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


def convert_nerf_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """reference UCNeRF ``network_fn_state_dict`` -> our nerf param tree.

    Layer name map (reference ``network/models.py:87-106`` vs our
    ``BaseAdaptRenderer``).  The reference's unused layers
    (feature_linear_1, confi_linear, pts_bias_confidence_1) are dropped.
    """
    p = {}
    def lin(name):
        return _t2j_linear(sd, "nerf." + name)
    names = ["pts_bias_depth_fine", "pts_bias_confidence", "feature_linear",
             "confi_rgb_linear", "alpha_linear_1", "rgb_linear",
             "alpha_linear"]
    for n in names:
        p[n] = lin(n)
    for i in range(6):
        p[f"pts_linears_{i}"] = lin(f"pts_linears.{i}")
    p["views_linears_0"] = lin("views_linears.0")
    p["view_confi_linears_0"] = lin("view_confi_linears.0")
    return {"nerf": p}


def _conv_block(sd, prefix, spatial, bn=True):
    """reference Conv2d/Conv3d wrapper module -> our ConvBNReLU params."""
    out = {"Conv_0": _t2j_conv(sd, prefix + ".conv", spatial)}
    if bn:
        out["BatchStatNorm_0"] = _t2j_bn(sd, prefix + ".bn")
    return out


def _deconv_block(sd, prefix, spatial):
    out = _t2j_convT(sd, prefix + ".conv", spatial)
    res = {"kernel": out["kernel"]}
    res_bn = _t2j_bn(sd, prefix + ".bn")
    return {"kernel": res["kernel"], "BatchStatNorm_0": res_bn}


def convert_casmvsnet_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Published CasMVSNet checkpoint -> our CascadeMVSNet param tree.

    FeatureNet naming (reference ``mvs_models.py:319-369``): conv0.{0,1},
    conv1.{0,1,2}, conv2.{0,1,2} wrapper convs; out1/inner1/inner2/out2/out3
    bare convs.  CostRegNet (``:412-443``): conv0..conv11 + prob.
    """
    feat = {}
    # sequential wrapper blocks -> our ConvBNReLU_i ordering inside FeatureNet
    seq = [("conv0.0", 2), ("conv0.1", 2),
           ("conv1.0", 2), ("conv1.1", 2), ("conv1.2", 2),
           ("conv2.0", 2), ("conv2.1", 2), ("conv2.2", 2)]
    for i, (name, sp) in enumerate(seq):
        feat[f"ConvBNReLU_{i}"] = _conv_block(sd, "feature." + name, sp)
    bare = {"out1": "Conv_0", "inner1": "Conv_1", "out2": "Conv_2",
            "inner2": "Conv_3", "out3": "Conv_4"}
    for tname, jname in bare.items():
        feat[jname] = _t2j_conv(sd, "feature." + tname, 2)

    tree = {"feature": feat}
    for s in range(3):
        cr = {}
        convs = ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5",
                 "conv6"]
        for i, cname in enumerate(convs):
            cr[f"ConvBNReLU_{i}"] = _conv_block(
                sd, f"cost_regularization.{s}.{cname}", 3)
        for i, cname in enumerate(["conv7", "conv9", "conv11"]):
            cr[f"ConvTransposeBNReLU_{i}"] = _deconv_block(
                sd, f"cost_regularization.{s}.{cname}", 3)
        cr["Conv_0"] = _t2j_conv(sd, f"cost_regularization.{s}.prob", 3)
        tree[f"cost_reg_{s}"] = cr
    return tree


def convert_reference_checkpoint(path: str):
    """Reference torch checkpoint -> param trees.

    Handles BOTH reference formats (``network/models.py:240-266``):
    - ``ucnerf.tar``: {network_fn_state_dict, network_mvs_state_dict}
      -> {"nerf": ..., "mvs": ...}
    - ``casmvsnet.ckpt`` (the published CasMVSNet weights the reference
      hard-downloads; stored as {'model': state_dict}) -> {"mvs": ...}
      only — the caller merges over freshly initialized NeRF params.
    """
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)

    def to_np(sd):
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}

    if "network_fn_state_dict" in obj:
        return {"nerf": convert_nerf_state_dict(
                    to_np(obj["network_fn_state_dict"])),
                "mvs": convert_casmvsnet_state_dict(
                    to_np(obj["network_mvs_state_dict"]))}
    if "model" in obj:
        return {"mvs": convert_casmvsnet_state_dict(to_np(obj["model"]))}
    raise ValueError(
        f"{path}: unrecognized checkpoint format (expected ucnerf.tar "
        "keys network_fn_state_dict/network_mvs_state_dict, or "
        "casmvsnet.ckpt key 'model'); found " + ", ".join(sorted(obj)[:8]))


# -------------------------------------------------------------- npz params
def _flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        kk = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten_tree(v, kk))
        else:
            out[kk] = np.asarray(v)
    return out


def save_params_npz(params: Dict, path: str) -> str:
    """Nested param tree -> flat '/'-keyed .npz (the portable converted-
    weights format written by ``convert_weights.py``)."""
    np.savez(path, **_flatten_tree(params))
    return path


def load_params_npz(path: str) -> Dict:
    """'/'-keyed .npz -> nested param tree (inverse of save_params_npz)."""
    data = np.load(path)
    tree: Dict = {}
    for k in data.files:
        parts = k.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = data[k]
    return tree


# ----------------------------------------------------- jax -> torch mapping
def _j2t_linear(tree, prefix, out):
    out[prefix + ".weight"] = np.asarray(tree["Dense_0"]["kernel"]).T
    out[prefix + ".bias"] = np.asarray(tree["Dense_0"]["bias"])


def _j2t_conv(tree, prefix, spatial, out):
    k = np.asarray(tree["kernel"])
    perm = (spatial + 1, spatial) + tuple(range(spatial))
    out[prefix + ".weight"] = np.transpose(k, perm)
    if "bias" in tree:
        out[prefix + ".bias"] = np.asarray(tree["bias"])


def _j2t_convT(tree, prefix, spatial, out):
    k = np.asarray(tree["kernel"])          # (*k, Cout, Cin)
    perm = (spatial + 1, spatial) + tuple(range(spatial))
    out[prefix + ".weight"] = np.transpose(k, perm)


def _j2t_bn(tree, prefix, out):
    out[prefix + ".weight"] = np.asarray(tree["scale"])
    out[prefix + ".bias"] = np.asarray(tree["bias"])
    c = out[prefix + ".weight"].shape[0]
    out[prefix + ".running_mean"] = np.zeros(c, np.float32)
    out[prefix + ".running_var"] = np.ones(c, np.float32)
    out[prefix + ".num_batches_tracked"] = np.zeros((), np.int64)


def export_nerf_state_dict(nerf_params) -> Dict[str, np.ndarray]:
    """Our nerf tree -> reference ``network_fn_state_dict`` naming
    (the reference's unused layers are not emitted)."""
    p = nerf_params["nerf"]
    out = {}
    for n in ["pts_bias_depth_fine", "pts_bias_confidence", "feature_linear",
              "confi_rgb_linear", "alpha_linear_1", "rgb_linear",
              "alpha_linear"]:
        _j2t_linear(p[n], "nerf." + n, out)
    for i in range(6):
        _j2t_linear(p[f"pts_linears_{i}"], f"nerf.pts_linears.{i}", out)
    _j2t_linear(p["views_linears_0"], "nerf.views_linears.0", out)
    _j2t_linear(p["view_confi_linears_0"], "nerf.view_confi_linears.0", out)
    return out


def export_casmvsnet_state_dict(mvs_params) -> Dict[str, np.ndarray]:
    feat = mvs_params["feature"]
    out = {}
    seq = ["conv0.0", "conv0.1", "conv1.0", "conv1.1", "conv1.2",
           "conv2.0", "conv2.1", "conv2.2"]
    for i, name in enumerate(seq):
        _j2t_conv(feat[f"ConvBNReLU_{i}"]["Conv_0"],
                  f"feature.{name}.conv", 2, out)
        _j2t_bn(feat[f"ConvBNReLU_{i}"]["BatchStatNorm_0"],
                f"feature.{name}.bn", out)
    for tname, jname in [("out1", "Conv_0"), ("inner1", "Conv_1"),
                         ("out2", "Conv_2"), ("inner2", "Conv_3"),
                         ("out3", "Conv_4")]:
        _j2t_conv(feat[jname], f"feature.{tname}", 2, out)
    for s in range(3):
        cr = mvs_params[f"cost_reg_{s}"]
        for i, cname in enumerate(["conv0", "conv1", "conv2", "conv3",
                                   "conv4", "conv5", "conv6"]):
            _j2t_conv(cr[f"ConvBNReLU_{i}"]["Conv_0"],
                      f"cost_regularization.{s}.{cname}.conv", 3, out)
            _j2t_bn(cr[f"ConvBNReLU_{i}"]["BatchStatNorm_0"],
                    f"cost_regularization.{s}.{cname}.bn", out)
        for i, cname in enumerate(["conv7", "conv9", "conv11"]):
            _j2t_convT(cr[f"ConvTransposeBNReLU_{i}"],
                       f"cost_regularization.{s}.{cname}.conv", 3, out)
            _j2t_bn(cr[f"ConvTransposeBNReLU_{i}"]["BatchStatNorm_0"],
                    f"cost_regularization.{s}.{cname}.bn", out)
        _j2t_conv(cr["Conv_0"], f"cost_regularization.{s}.prob", 3, out)
    return out


def load_eval_params(cfg, params):
    """Resolve ``--ckpt`` for the inference CLIs (train.py --eval,
    render_path.py, serve.py): a torch ``.tar/.ckpt/.pth`` converts on the
    fly (reference ``network/models.py:253-266`` load path); anything else
    is an orbax directory whose params subtree is restored (params-only,
    so a checkpoint saved by ANY phase — including the finetune run's
    multi_transform optimizer, whose opt_state structure differs from
    plain adam — loads for inference).  With no ``--ckpt``, the given
    init params pass through."""
    if not cfg.ckpt:
        return params
    if cfg.ckpt.endswith((".tar", ".ckpt", ".pth")):
        # merge over init: a bare casmvsnet.ckpt seeds only the MVS tree
        return {**params, **convert_reference_checkpoint(cfg.ckpt)}
    if cfg.ckpt.endswith(".npz"):
        return {**params, **load_params_npz(cfg.ckpt)}
    return load_params(cfg.ckpt, params)
