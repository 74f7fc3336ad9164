"""Microbench: what 3x3-conv formulation actually feeds the v5e MXU.

Times with in-graph fori_loop iteration (tunnel-safe; see _bench_util).
Cases:
  matmul   - peak check at MXU-saturating and conv-like (M, K, N)
  conv2d   - 3x3 'same' NHWC at encoder channel widths
  convzu   - z-u-factorized 3^3 conv: ONE 2D conv (B*D, H, W, C) x
             (3, 3, C, 3*Cout) computing all three z-partials (N=3Cout
             fills the 128 output lanes), then 2 shifted adds over D
  conv3d   - XLA native 3 spatial dims (NDHWC)

Usage: python tools/analysis_tools/micro_conv_forms.py [section ...]
sections: matmul conv2d stages   (default all)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tools.analysis_tools._bench_util import bench_loop


def conv2d(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=[(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def convzu(x, w):
    """x (B, D, H, W, C); w (3,3,3,Cin,Cout) z-major -> full 3^3 conv."""
    b, d, h, ww, c = x.shape
    cout = w.shape[-1]
    w2 = w.transpose(1, 2, 3, 0, 4).reshape(3, 3, c, 3 * cout)
    u = conv2d(x.reshape(b * d, h, ww, c), w2).reshape(b, d, h, ww,
                                                       3 * cout)
    u0, u1, u2 = u[..., :cout], u[..., cout:2 * cout], u[..., 2 * cout:]
    # out[z] = sum_dz w[dz] x[z+dz-1] = u0[z-1] + u1[z] + u2[z+1]
    zpadh = jnp.zeros_like(u0[:, :1])
    dn = jnp.concatenate([zpadh, u0[:, :-1]], axis=1)
    up = jnp.concatenate([u2[:, 1:], zpadh], axis=1)
    return dn + u1 + up


def conv3d(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1, 1),
        padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def main():
    rng = np.random.default_rng(0)
    secs = sys.argv[1:] or ["matmul", "conv2d", "stages"]

    if "matmul" in secs:
        print("== matmul", flush=True)
        for m, k, n in ((8192, 2048, 2048), (32768, 1024, 1024),
                        (131072, 576, 192), (131072, 576, 64)):
            a = jnp.asarray(rng.normal(0, 1, (m, k)), jnp.bfloat16)
            b = jnp.asarray(rng.normal(0, 1, (k, n)), jnp.bfloat16)
            p = jnp.asarray(rng.normal(0, 1, (n, k)), jnp.bfloat16)
            # shape-preserving: project back with a second matmul (its
            # flops are counted too)
            bench_loop(lambda aa: ((aa @ b) @ p).astype(aa.dtype), a,
                       name=f"dot {m}x{k}x{n} (x2)",
                       flops=2 * m * k * n * 2)
            del a, b, p

    if "conv2d" in secs:
        print("== conv2d 3x3 rate vs C (H=W=360, B=11)", flush=True)
        for c in (32, 64, 128, 256):
            x = jnp.asarray(rng.normal(0, 1, (11, 360, 360, c)),
                            jnp.bfloat16)
            w = jnp.asarray(rng.normal(0, 0.05, (3, 3, c, c)), jnp.bfloat16)
            fl = 2 * 9 * c * c * 11 * 360 * 360
            bench_loop(lambda v: conv2d(v, w), x, name=f"conv2d C={c}",
                       flops=fl)
            del x, w

    if "stages" in secs:
        print("== full 3^3 stage shapes", flush=True)
        for name, d, hw, c in (("stage2", 21, 720, 64),
                               ("stage3", 11, 360, 128),
                               ("stage4", 5, 180, 256)):
            x = jnp.asarray(rng.normal(0, 1, (1, d, hw, hw, c)),
                            jnp.bfloat16)
            w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, c, c)),
                            jnp.bfloat16)
            fl = 2 * 27 * c * c * d * hw * hw
            bench_loop(lambda v: conv3d(v, w), x, name=f"conv3d {name}",
                       flops=fl)
            bench_loop(lambda v: convzu(v, w), x, name=f"convzu {name}",
                       flops=fl)
            del x, w

        # parity
        xs = jnp.asarray(rng.normal(0, 1, (1, 5, 16, 16, 8)), jnp.float32)
        wt = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 8, 8)), jnp.float32)
        ref = conv3d(xs, wt)
        got = convzu(xs, wt)
        print("convzu parity err:", float(jnp.max(jnp.abs(ref - got))),
              flush=True)


if __name__ == "__main__":
    main()
