"""PyTorch -> flax checkpoint conversion for the pretrained Swin backbone.

Parity: the reference warm-starts from `swint-nuimages-pretrained-e2e.pth`
(`configs/isfusion/isfusion_0075voxel.py:433`) with key remapping in
`mmdet3d/models/utils/ckpt_convert.py`. This module maps mmdet-style Swin
state_dict keys (`patch_embed.projection`, `stages.{i}.blocks.{d}.*`,
`stages.{i}.downsample.*`, output `norm{i}`) onto the flax parameter tree of
`isfusion_tpu.models.backbones.swin.SwinTransformer`, transposing torch
(out, in) linear weights to flax (in, out) kernels and OIHW convs to HWIO.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def convert_swin_torch_to_flax(state_dict: Dict[str, "object"],
                               prefix: str = "") -> Dict:
    """Returns a nested flax params dict for SwinTransformer.

    ``prefix`` strips a leading scope (e.g. 'img_backbone.' for full
    detector checkpoints or 'backbone.' for mm-style pretraining dumps).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items()
          if k.startswith(prefix)}
    params: Dict = {}

    def put(path, value):
        d = params
        for p in path[:-1]:
            d = d.setdefault(p, {})
        d[path[-1]] = value

    def dense(dst, w=None, b=None):
        if w is not None:
            put(dst + ("kernel",), _t(w).T)
        if b is not None:
            put(dst + ("bias",), _t(b))

    def ln(dst, w, b):
        put(dst + ("scale",), _t(w))
        put(dst + ("bias",), _t(b))

    for k, v in sd.items():
        # patch embed conv: torch OIHW -> flax HWIO
        if k == "patch_embed.projection.weight":
            put(("patch_embed", "kernel"), _t(v).transpose(2, 3, 1, 0))
        elif k == "patch_embed.projection.bias":
            put(("patch_embed", "bias"), _t(v))
        elif k == "patch_embed.norm.weight":
            put(("patch_norm", "scale"), _t(v))
        elif k == "patch_embed.norm.bias":
            put(("patch_norm", "bias"), _t(v))
        elif m := re.match(r"norm(\d)\.(weight|bias)", k):
            i, wb = int(m.group(1)), m.group(2)
            put((f"out_norm{i}", "scale" if wb == "weight" else "bias"),
                _t(v))
        elif m := re.match(
                r"stages\.(\d+)\.downsample\.(norm|reduction)\.(weight|bias)",
                k):
            i, mod, wb = int(m.group(1)), m.group(2), m.group(3)
            if mod == "norm":
                put((f"downsample{i}", "norm",
                     "scale" if wb == "weight" else "bias"), _t(v))
            else:
                dense((f"downsample{i}", "reduction"), w=v)
        elif m := re.match(r"stages\.(\d+)\.blocks\.(\d+)\.(.*)", k):
            i, d, rest = int(m.group(1)), int(m.group(2)), m.group(3)
            base = (f"stage{i}_block{d}",)
            if rest == "norm1.weight":
                ln(base + ("norm1",), v, sd[
                    f"stages.{i}.blocks.{d}.norm1.bias"])
            elif rest == "norm2.weight":
                ln(base + ("norm2",), v, sd[
                    f"stages.{i}.blocks.{d}.norm2.bias"])
            elif rest in ("norm1.bias", "norm2.bias"):
                pass  # handled with the weight
            elif rest == "attn.w_msa.relative_position_bias_table":
                put(base + ("attn", "w_msa",
                            "relative_position_bias_table"), _t(v))
            elif rest == "attn.w_msa.relative_position_index":
                pass  # static in our implementation
            elif rest == "attn.w_msa.qkv.weight":
                dense(base + ("attn", "w_msa", "qkv"), w=v)
            elif rest == "attn.w_msa.qkv.bias":
                dense(base + ("attn", "w_msa", "qkv"), b=v)
            elif rest == "attn.w_msa.proj.weight":
                dense(base + ("attn", "w_msa", "proj"), w=v)
            elif rest == "attn.w_msa.proj.bias":
                dense(base + ("attn", "w_msa", "proj"), b=v)
            elif rest == "ffn.layers.0.0.weight":
                dense(base + ("ffn_fc1",), w=v)
            elif rest == "ffn.layers.0.0.bias":
                dense(base + ("ffn_fc1",), b=v)
            elif rest == "ffn.layers.1.weight":
                dense(base + ("ffn_fc2",), w=v)
            elif rest == "ffn.layers.1.bias":
                dense(base + ("ffn_fc2",), b=v)
    return params


def load_torch_checkpoint(path: str) -> Dict:
    """Load a .pth file (CPU) and return its state_dict."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        return ckpt["state_dict"]
    return ckpt


def merge_pretrained_swin(variables: Dict, state_dict: Dict,
                          flax_scope: str = "img_backbone_m",
                          torch_prefix: str = "img_backbone.") -> Dict:
    """Graft converted Swin weights into a full detector's variables.
    Shapes are validated; mismatching leaves raise."""
    import jax
    converted = convert_swin_torch_to_flax(state_dict, prefix=torch_prefix)
    params = dict(variables["params"])
    target = params.get(flax_scope)
    if target is None:
        raise KeyError(f"{flax_scope} not in params "
                       f"({list(params.keys())})")

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in out:
                raise KeyError(f"converted key {path}/{k} missing in model")
            if isinstance(v, dict):
                out[k] = merge(out[k], v, f"{path}/{k}")
            else:
                if tuple(out[k].shape) != tuple(v.shape):
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: "
                        f"{out[k].shape} vs {v.shape}")
                out[k] = v.astype(np.asarray(out[k]).dtype)
        return out

    params[flax_scope] = merge(target, converted)
    return {**variables, "params": params}
