"""Microbench: dense 3D-conv formulations at the encoder's stage shapes.

The dense-stage hybrid (ops/sparse_dense.py) measured ~6x off its FLOP
roofline on the v5e (dense stages 3+4 ~300 ms vs a ~55 ms floor).
Hypothesis: XLA's TPU lowering of a conv with THREE spatial dims tiles
poorly. This times, per stage shape:

  conv3d   - lax.conv_general_dilated, (B, H, W, D, C), 3 spatial dims
  conv3d2  - same but (B, D, H, W, C) "NDHWC" ordering
  zfold    - z-im2col: stack the 3 z-shifted slices on channels
             -> ONE 2D conv (B*D, H, W, 3C) x (3, 3, 3C, Cout)
  zsum     - sum over dz of three 2D convs on z-shifted (B*D, H, W, C)
             views (no 3C concat buffer)

All formulations compute the same 3^3 'same' conv; parity asserted at a
tiny shape. Usage: python tools/analysis_tools/micro_dense_conv.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

# flagship stage shapes after the strided conv INTO the stage:
#   stage 2: z=21 720^2 C=64, stage 3: z=11 360^2 C=128,
#   stage 4: z=5 180^2 C=256
SHAPES = [
    ("stage2", 21, 720, 64),
    ("stage3", 11, 360, 128),
    ("stage4", 5, 180, 256),
]


def timeit(fn, *args, n=6, name=""):
    out = fn(*args)
    jax.device_get(jnp.sum(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jnp.sum(out).ravel()[0])
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"  {name:28s} {dt:8.2f} ms", flush=True)
    return dt


def conv3d(x, w):  # x (B,H,W,D,C), w (3,3,3,C,C) kz-major like the engine
    return jax.lax.conv_general_dilated(
        x, w.transpose(1, 2, 0, 3, 4).astype(x.dtype),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        preferred_element_type=x.dtype)


def conv3d2(x, w):  # x (B,D,H,W,C)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1, 1), padding=[(1, 1)] * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=x.dtype)


def _zstack(x):
    """(B, D, H, W, C) -> (B, D, H, W, 3C): z-1, z, z+1 slices."""
    zpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    d = x.shape[1]
    return jnp.concatenate([zpad[:, 0:d], x, zpad[:, 2:d + 2]], axis=-1)


def zfold(x, w):  # x (B,D,H,W,C), w (3,3,3,C,Cout) z-major
    b, d, h, ww, c = x.shape
    cout = w.shape[-1]
    xs = _zstack(x).reshape(b * d, h, ww, 3 * c)
    # channel blocks are [z-1, z, z+1] = kz index 0,1,2
    wk = w.transpose(1, 2, 0, 3, 4).reshape(3, 3, 3 * c, cout)
    return jax.lax.conv_general_dilated(
        xs, wk.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype).reshape(b, d, h, ww, cout)


def zsum(x, w):  # x (B,D,H,W,C)
    b, d, h, ww, c = x.shape
    cout = w.shape[-1]
    zpad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    acc = None
    for dz in range(3):
        xi = zpad[:, dz:dz + d].reshape(b * d, h, ww, c)
        y = jax.lax.conv_general_dilated(
            xi, w[dz].astype(x.dtype), window_strides=(1, 1),
            padding=[(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype)
        acc = y if acc is None else acc + y
    return acc.reshape(b, d, h, ww, cout)


def conv2d_ref(x, w):  # x (B*D, H, W, C), w (3,3,C,C): attainable 2D rate
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def main():
    rng = np.random.default_rng(0)
    # parity at a tiny shape
    xs = jnp.asarray(rng.normal(0, 1, (1, 5, 16, 16, 8)), jnp.float32)
    wt = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 8, 8)), jnp.float32)
    a = conv3d(xs.transpose(0, 2, 3, 1, 4), wt).transpose(0, 3, 1, 2, 4)
    for f in (conv3d2, zfold, zsum):
        b = f(xs, wt)
        err = float(jnp.max(jnp.abs(a - b)))
        assert err < 1e-4, (f.__name__, err)
    print("parity ok", flush=True)

    for name, d, hw, c in SHAPES:
        x = jnp.asarray(rng.normal(0, 1, (1, d, hw, hw, c)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(0, 0.05, (3, 3, 3, c, c)), jnp.bfloat16)
        gflop = 2 * 27 * c * c * d * hw * hw / 1e9
        print(f"-- {name}: D={d} HW={hw} C={c}  ({gflop:.0f} GFLOP)",
              flush=True)
        x2 = x.reshape(d, hw, hw, c)
        t = timeit(jax.jit(conv2d_ref), x2, w[1],
                   name="conv2d ref (1/3 flops)")
        print(f"      -> {gflop / 3 / t:.1f} TF/s")
        for f, nm in ((conv3d2, "conv3d NDHWC"), (zfold, "zfold 2D conv"),
                      (zsum, "zsum 3x 2D conv")):
            try:
                t = timeit(jax.jit(f), x, w, name=nm)
                print(f"      -> {gflop / t:.1f} TF/s")
            except Exception as e:
                print(f"  {nm:28s} FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
