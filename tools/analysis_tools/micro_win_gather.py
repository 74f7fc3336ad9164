"""Microbenchmark: windowed-column gather primitives (round-3 redesign).

Questions this answers on the real chip:
1. 2D row-gather speed at windowed row sizes (W*C in {512, 768, 1024, 1536}
   elements) vs the Z-dense rows (48*C) — is the W-window proportional win
   real, or does the per-row floor (~12 ns) eat it?
2. 1D flat slice-gather (operand (V*W*C,), per-row start = j*W*C + delta*C,
   256-element aligned) vs plain 2D row gather — the windowed engine folds
   the per-neighbor z-offset delta into the gather start; if 1D slice
   gather is as fast as row gather, alignment costs nothing.
3. Found-rate sensitivity: ~56% of side-tap queries miss at stage 0; rows
   still move. Confirm cost is per-issued-row, not per-found-row.

Run: python tools/analysis_tools/micro_win_gather.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.device_get(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    v = 123_904          # stage-0 active columns (multiple of 256)
    dtype = jnp.bfloat16

    print(f"{'case':38s} {'ms':>8s} {'GB/s':>7s} {'ns/row':>7s}")
    for f in (512, 768, 1024, 1536, 2304):
        src = jnp.asarray(rng.standard_normal((v, f)), dtype)
        idx = jnp.asarray(rng.integers(0, v, v), jnp.int32)
        bytes_moved = v * f * 2 * 2  # read + write

        @jax.jit
        def row_gather(s, i):
            return s.at[i].get(unique_indices=False,
                               mode="promise_in_bounds")

        t = timeit(row_gather, src, idx)
        print(f"2D row gather   f={f:5d}            "
              f"{t * 1e3:8.2f} {bytes_moved / t / 1e9:7.1f} "
              f"{t / v * 1e9:7.1f}")

        # 1D flat slice gather with 256-element-aligned starts
        flat = src.reshape(-1)
        delta = jnp.asarray(
            rng.choice([-256, 0, 256], v, p=[0.05, 0.9, 0.05]), jnp.int32)
        starts = jnp.clip(idx * f + delta, 0, v * f - f)

        @jax.jit
        def slice_gather(fl, st):
            return jax.vmap(
                lambda s: jax.lax.dynamic_slice(fl, (s,), (f,)))(st)

        try:
            t = timeit(slice_gather, flat, starts)
            print(f"1D slice gather f={f:5d} (aligned)  "
                  f"{t * 1e3:8.2f} {bytes_moved / t / 1e9:7.1f} "
                  f"{t / v * 1e9:7.1f}")
        except Exception as e:  # noqa: BLE001
            print(f"1D slice gather f={f:5d}: FAILED {str(e)[:120]}")

        # unaligned starts (64-element granularity) for comparison
        delta_u = jnp.asarray(
            rng.choice([-64, 0, 64], v, p=[0.05, 0.9, 0.05]), jnp.int32)
        starts_u = jnp.clip(idx * f + delta_u, 0, v * f - f)
        try:
            t = timeit(slice_gather, flat, starts_u)
            print(f"1D slice gather f={f:5d} (64-elem)  "
                  f"{t * 1e3:8.2f} {bytes_moved / t / 1e9:7.1f} "
                  f"{t / v * 1e9:7.1f}")
        except Exception as e:  # noqa: BLE001
            print(f"1D slice gather f={f:5d}: FAILED {str(e)[:120]}")


if __name__ == "__main__":
    main()
