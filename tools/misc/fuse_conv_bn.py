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
            if isinstance(v2, dict) and "scale" in v2 and "bias" in v2 \
                    and key in stats and k2 in stats.get(key, {}):
                bn_scope = k2
        if kern_scope and bn_scope and kern_scope != bn_scope:
            conv = sub[kern_scope]
            bn = sub[bn_scope]
            st = stats[key][bn_scope]
            mean = _leaf(st, "mean")
            var = _leaf(st, "var")
            if mean is None or var is None:
                continue
            scale = np.asarray(bn["scale"]) / np.sqrt(
                np.asarray(var) + eps)
            conv["kernel"] = np.asarray(conv["kernel"]) * scale
            bias = np.asarray(conv.get("bias", 0.0))
            conv["bias"] = bias * scale + np.asarray(bn["bias"]) - \
                np.asarray(mean) * scale
            bn["scale"] = np.ones_like(np.asarray(bn["scale"]))
            bn["bias"] = np.zeros_like(np.asarray(bn["bias"]))
            _set_leaf(st, "mean", np.zeros_like(np.asarray(mean)))
            _set_leaf(st, "var", np.ones_like(np.asarray(var)))
            count += 1
        count += fuse_tree(sub, stats.get(key, {}), eps) \
            if isinstance(stats.get(key), dict) else 0
    return count


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
