"""Does `indices_are_sorted=True` speed the u-combine row gathers?

The subm conv's two y+-1 gathers (`sparse_cols._gather_rows`) use
NEAR-MONOTONE slot indices, but not-found queries clip to interspersed
out-of-sequence slots, so the hint has been unusable. A host plan could
instead emit MONOTONE-SAFE miss slots (carry the previous found slot;
the found mask already zeroes those rows), making the hint legal. This
measures whether that buys anything at the engine's exact shapes before
any plan surgery. Feature data is generated ON DEVICE (a 410 MB host
upload costs ~27 s through the axon tunnel and once stalled this tool).
Run: python tools/analysis_tools/micro_sorted_gather.py
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

# stage-0/1 u-gather shape: dilated table x (W * C) row
CASES = [
    (256000, 25 * 32),    # table 0 (W=25, C=32)
    (177320, 14 * 64),    # table 1 (W=14, C=64)
]


def main():
    rng = np.random.default_rng(0)
    for v, f in CASES:
        # near-monotone slots like a y+-1 rulebook: mostly idx ~ i +- a
        # few, ~8% misses
        base = np.arange(v, dtype=np.int32)
        jitter = rng.integers(-3, 4, size=v).astype(np.int32)
        idx = np.clip(base + jitter, 0, v - 1)
        miss = rng.random(v) < 0.08
        idx_clip0 = np.where(miss, 0, idx).astype(np.int32)       # today
        idx_sorted = np.maximum.accumulate(
            np.where(miss, -1, idx)).clip(0).astype(np.int32)     # planned
        src = jax.random.normal(jax.random.PRNGKey(0), (v, f),
                                jnp.bfloat16)
        gb = v * f * 2 / 1e9

        def g_plain(x, ii=jax.device_put(idx_clip0)):
            return x.at[ii].get(unique_indices=False,
                                mode="promise_in_bounds")

        def g_hint(x, ii=jax.device_put(idx_sorted)):
            return x.at[ii].get(unique_indices=False,
                                indices_are_sorted=True,
                                mode="promise_in_bounds")

        def g_sorted_nohint(x, ii=jax.device_put(idx_sorted)):
            return x.at[ii].get(unique_indices=False,
                                mode="promise_in_bounds")

        print(f"== (V={v}, F={f}) rows of {f * 2} B ({gb * 1e3:.0f} MB)",
              flush=True)
        for name, g in [("clip0 (today)", g_plain),
                        ("monotone idx, no hint", g_sorted_nohint),
                        ("monotone idx + indices_are_sorted",
                         g_hint)]:
            dt = bench_loop(g, src, name=name, quiet=True)
            if dt is not None:
                print(f"  {name:36s} {dt:7.2f} ms  {gb / dt * 1e3:6.1f} GB/s",
                      flush=True)


if __name__ == "__main__":
    main()
