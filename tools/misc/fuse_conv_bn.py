#!/usr/bin/env python
"""Fold BatchNorm statistics into preceding conv kernels for inference
(parity: `tools/misc/fuse_conv_bn.py`).

Walks a checkpoint's params/batch_stats, and wherever a module scope
contains both a conv kernel and a sibling BN (scale/bias + mean/var),
rewrites kernel' = kernel * scale/sqrt(var+eps), bias' = bias_bn -
mean*scale/sqrt(var+eps) (+ folds any existing conv bias), zeroing the
BN to identity. Writes a new orbax checkpoint.

Usage: python tools/misc/fuse_conv_bn.py WORK_DIR OUT_DIR
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))


def fuse_tree(params: dict, stats: dict, eps: float = 1e-3):
    """In-place conv+BN folding over matching scopes; returns fuse count."""
    count = 0
    for key in list(params.keys()):
        sub = params[key]
        if not isinstance(sub, dict):
            continue
        kern_scope = None
        bn_scope = None
        for k2, v2 in sub.items():
            if isinstance(v2, dict) and "kernel" in v2 and \
                    np.asarray(v2["kernel"]).ndim >= 4:
                kern_scope = k2
            # BN affine params may nest (ConvModule -> Norm_0 ->
            # BatchNorm_0 -> scale/bias); match through _leaf (r3 fix:
            # the direct-key match never fired on this layout, making
            # the whole tool a silent no-op)
            if isinstance(v2, dict) and _leaf(v2, "scale") is not None \
                    and _leaf(v2, "bias") is not None \
                    and key in stats and k2 in stats.get(key, {}):
                bn_scope = k2
        if kern_scope and bn_scope and kern_scope != bn_scope:
            conv = sub[kern_scope]
            bn = _scope_of(sub[bn_scope], "scale")
            st = _scope_of(stats[key][bn_scope], "mean")
            mean = _leaf(st, "mean")
            var = _leaf(st, "var")
            if mean is None or var is None:
                continue
            scale = np.asarray(bn["scale"]) / np.sqrt(
                np.asarray(var) + eps)
            conv["kernel"] = np.asarray(conv["kernel"]) * scale
            if "bias" in conv:
                conv["bias"] = np.asarray(conv["bias"]) * scale + \
                    np.asarray(bn["bias"]) - np.asarray(mean) * scale
                bn["bias"] = np.zeros_like(np.asarray(bn["bias"]))
                _set_leaf(st, "mean", np.zeros_like(np.asarray(mean)))
            else:
                # norm-followed convs have use_bias=False — a synthetic
                # 'bias' param would be silently IGNORED by flax.apply
                # (r3 review fix: the shift term was lost). Carry the
                # affine shift in the BN instead: with var=1-eps,
                # scale=1, bias=0, the BN computes y - mean_new exactly,
                # so mean_new := mean*scale - bias_bn reproduces
                # scale*(y - mean)/sqrt(var+eps) + bias_bn.
                _set_leaf(st, "mean",
                          (np.asarray(mean) * scale -
                           np.asarray(bn["bias"])).astype(
                               np.asarray(mean).dtype))
                bn["bias"] = np.zeros_like(np.asarray(bn["bias"]))
            bn["scale"] = np.ones_like(np.asarray(bn["scale"]))
            _set_leaf(st, "var",
                      np.full_like(np.asarray(var), 1.0 - eps))
            count += 1
        count += fuse_tree(sub, stats.get(key, {}), eps) \
            if isinstance(stats.get(key), dict) else 0
    return count


def _scope_of(d, name):
    """Innermost dict containing ``name`` as a direct key."""
    if name in d:
        return d
    for v in d.values():
        if isinstance(v, dict):
            r = _scope_of(v, name)
            if r is not None:
                return r
    return None


def _leaf(d, name):
    if name in d:
        return d[name]
    for v in d.values():
        if isinstance(v, dict):
            r = _leaf(v, name)
            if r is not None:
                return r
    return None


def _set_leaf(d, name, value):
    if name in d:
        d[name] = value
        return True
    for v in d.values():
        if isinstance(v, dict) and _set_leaf(v, name, value):
            return True
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("work_dir")
    ap.add_argument("out_dir")
    args = ap.parse_args()
    from isfusion_tpu.runner.checkpoint import load_params, save_checkpoint
    variables, meta = load_params(args.work_dir)
    import jax
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray,
                                   variables.get("batch_stats", {}))
    n = fuse_tree(params, stats)
    print(f"fused {n} conv+BN pairs")
    save_checkpoint(args.out_dir, dict(params=params, batch_stats=stats),
                    step=0, meta=dict(meta or {}, fused_conv_bn=True))


if __name__ == "__main__":
    main()
