"""Microbenchmarks for sparse-conv redesign candidates (round 2).

Measures on the real chip:
  1. row gather cost vs row size (is 9 ns/row fixed, or bandwidth-bound for
     fat rows?)
  2. scatter .at[].set / .add with and without sorted/unique hints
  3. dense 3D conv throughput (NDHWC) at detector channel widths
  4. searchsorted(method='sort') cost at rulebook sizes
Run: python tools/analysis_tools/micro_sparse.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    fn = jax.jit(fn)
    for _ in range(warmup):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_map(lambda x: x.ravel()[0], r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.device_get(jax.tree_util.tree_map(lambda x: x.ravel()[0], r))
    return (time.perf_counter() - t0) / iters


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")

    print("\n-- 1. row gather: (N rows, row_floats) fp32, random indices --")
    n = 100_000
    for row_floats in [16, 64, 256, 656, 2048, 2624*4]:
        tab = jax.random.normal(key, (n, row_floats), jnp.float32)
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)
        t = timeit(lambda tab, idx: jnp.sum(tab[idx]), tab, idx)
        gb = n * row_floats * 4 / 1e9
        print(f"  row={row_floats*4:>6}B: {t*1e3:7.2f} ms  "
              f"{t/n*1e9:6.1f} ns/row  {gb/t:6.1f} GB/s")

    print("\n-- 1b. same but bf16 rows --")
    for row_floats in [656, 2624]:
        tab = jax.random.normal(key, (n, row_floats), jnp.bfloat16)
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)
        t = timeit(lambda tab, idx: jnp.sum(tab[idx]), tab, idx)
        gb = n * row_floats * 2 / 1e9
        print(f"  row={row_floats*2:>6}B: {t*1e3:7.2f} ms  "
              f"{t/n*1e9:6.1f} ns/row  {gb/t:6.1f} GB/s")

    print("\n-- 1c. gather with ASCENDING (sorted) indices --")
    for row_floats in [64, 656]:
        tab = jax.random.normal(key, (n, row_floats), jnp.float32)
        idx = jnp.sort(jax.random.randint(key, (n,), 0, n, jnp.int32))
        t = timeit(lambda tab, idx: jnp.sum(tab[idx]), tab, idx)
        print(f"  row={row_floats*4:>6}B sorted-idx: {t*1e3:7.2f} ms  "
              f"{t/n*1e9:6.1f} ns/row")

    print("\n-- 2. scatter 100k rows x 64ch into 200k-row table --")
    upd = jax.random.normal(key, (n, 64), jnp.float32)
    tgt = jnp.zeros((2 * n, 64), jnp.float32)
    ridx = jax.random.randint(key, (n,), 0, 2 * n, jnp.int32)
    sidx = jnp.sort(ridx)
    uidx = jnp.arange(n, dtype=jnp.int32) * 2  # unique + sorted
    t = timeit(lambda t_, i, u: t_.at[i].add(u), tgt, ridx, upd)
    print(f"  random .add:                {t*1e3:7.2f} ms {t/n*1e9:6.1f} ns/row")
    t = timeit(lambda t_, i, u: t_.at[i].add(
        u, indices_are_sorted=True), tgt, sidx, upd)
    print(f"  sorted .add:                {t*1e3:7.2f} ms {t/n*1e9:6.1f} ns/row")
    t = timeit(lambda t_, i, u: t_.at[i].set(
        u, unique_indices=True, indices_are_sorted=True), tgt, uidx, upd)
    print(f"  sorted+unique .set:         {t*1e3:7.2f} ms {t/n*1e9:6.1f} ns/row")
    t = timeit(lambda t_, i, u: t_.at[i].add(
        u, unique_indices=True, indices_are_sorted=True), tgt, uidx, upd)
    print(f"  sorted+unique .add:         {t*1e3:7.2f} ms {t/n*1e9:6.1f} ns/row")

    print("\n-- 3. dense 3D conv NDHWC batch=T blocks --")
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))
    for (t_blocks, s, z, c, co) in [(4096, 16, 41, 32, 32),
                                    (4096, 16, 41, 32, 32),
                                    (2048, 16, 21, 64, 64),
                                    (1024, 16, 11, 128, 128),
                                    (512, 16, 5, 256, 256)]:
        x = jax.random.normal(key, (t_blocks, z, s, s, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, c, co), jnp.bfloat16)
        f = functools.partial(
            jax.lax.conv_general_dilated, window_strides=(1, 1, 1),
            padding="SAME", dimension_numbers=dn)
        t = timeit(lambda x, w: jnp.sum(f(x, w)), x, w)
        flops = 2 * t_blocks * z * s * s * 27 * c * co
        print(f"  T={t_blocks} {s}x{s}x{z} C{c}->{co}: {t*1e3:7.2f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s")

    print("\n-- 3b. dense 2D conv on big BEV canvas (ref shapes) --")
    dn2 = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1), (1, 1, 1, 1), ("NHWC", "HWIO", "NHWC"))
    for (h, c, co) in [(180, 128, 128), (360, 64, 64)]:
        x = jax.random.normal(key, (1, h, h, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, c, co), jnp.bfloat16)
        f = functools.partial(
            jax.lax.conv_general_dilated, window_strides=(1, 1),
            padding="SAME", dimension_numbers=dn2)
        t = timeit(lambda x, w: jnp.sum(f(x, w)), x, w)
        flops = 2 * h * h * 9 * c * co
        print(f"  {h}x{h} C{c}: {t*1e3:7.2f} ms  {flops/t/1e12:6.1f} TFLOP/s")

    print("\n-- 4. searchsorted(method=sort) at rulebook sizes --")
    for (tab_n, q_n) in [(120_000, 27 * 120_000), (120_000, 9 * 120_000),
                         (60_000, 9 * 60_000), (8_192, 9 * 8_192)]:
        tab = jnp.sort(jax.random.randint(key, (tab_n,), 0, 1 << 30,
                                          jnp.int32))
        q = jax.random.randint(key, (q_n,), 0, 1 << 30, jnp.int32)
        t = timeit(lambda tab, q: jnp.sum(
            jnp.searchsorted(tab, q, method="sort")), tab, q)
        print(f"  tab={tab_n} q={q_n}: {t*1e3:7.2f} ms")

    print("\n-- 5. matmul peak check (bf16) --")
    for m in [4096, 8192]:
        a = jax.random.normal(key, (m, m), jnp.bfloat16)
        t = timeit(lambda a: jnp.sum(
            jnp.dot(a, a, preferred_element_type=jnp.float32)), a)
        print(f"  {m}^3 matmul: {t*1e3:7.2f} ms  "
              f"{2*m**3/t/1e12:6.1f} TFLOP/s")


if __name__ == "__main__":
    main()
