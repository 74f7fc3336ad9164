"""Microbench round 2: in-jit fori_loop to remove per-dispatch overhead.

Each measurement runs REPS iterations of the op inside one jit computation
with a data dependency, so host dispatch cost is amortized away.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp

REPS = 20


def timeit_loop(op, init, iters=3, warmup=1):
    """op: carry -> carry. Times REPS applications inside one jit."""
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, REPS, lambda i, c: op(c), c)

    for _ in range(warmup):
        r = run(init)
    jax.device_get(jax.tree_util.tree_map(lambda x: x.ravel()[0], r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = run(init)
    jax.device_get(jax.tree_util.tree_map(lambda x: x.ravel()[0], r))
    return (time.perf_counter() - t0) / (iters * REPS)


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")

    print("\n-- 1. row gather (random idx), in-loop --")
    n = 100_000
    for row_floats in [16, 64, 164, 656, 2624]:
        tab = jax.random.normal(key, (n, row_floats), jnp.float32)
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)

        def op(c, tab=tab, idx=idx):
            s, i = c
            g = tab[(idx + i) % n]
            return s + jnp.sum(g), i + 1
        t = timeit_loop(op, (jnp.float32(0), jnp.int32(0)))
        gb = n * row_floats * 4 / 1e9
        print(f"  row={row_floats*4:>6}B: {t*1e3:7.3f} ms  "
              f"{t/n*1e9:6.1f} ns/row  {gb/t:6.1f} GB/s")

    print("\n-- 1b. bf16 row gather --")
    for row_floats in [656, 1312]:
        tab = jax.random.normal(key, (n, row_floats), jnp.bfloat16)
        idx = jax.random.randint(key, (n,), 0, n, jnp.int32)

        def op(c, tab=tab, idx=idx):
            s, i = c
            g = tab[(idx + i) % n]
            return s + jnp.sum(g.astype(jnp.float32)), i + 1
        t = timeit_loop(op, (jnp.float32(0), jnp.int32(0)))
        gb = n * row_floats * 2 / 1e9
        print(f"  row={row_floats*2:>6}B: {t*1e3:7.3f} ms  "
              f"{t/n*1e9:6.1f} ns/row  {gb/t:6.1f} GB/s")

    print("\n-- 2. scatter-add 100k x 64ch --")
    upd = jax.random.normal(key, (n, 64), jnp.float32)
    ridx = jax.random.randint(key, (n,), 0, 2 * n, jnp.int32)
    sidx = jnp.sort(ridx)
    tgt0 = jnp.zeros((2 * n, 64), jnp.float32)

    def op_r(c):
        t_, i = c
        return t_.at[(ridx + i) % (2 * n)].add(upd), i + 1
    t = timeit_loop(op_r, (tgt0, jnp.int32(0)))
    print(f"  random .add: {t*1e3:7.3f} ms  {t/n*1e9:6.1f} ns/row")

    def op_s(c):
        t_, i = c
        return t_.at[sidx].add(upd * (1.0 + i), indices_are_sorted=True), i + 1
    t = timeit_loop(op_s, (tgt0, jnp.int32(0)))
    print(f"  sorted .add: {t*1e3:7.3f} ms  {t/n*1e9:6.1f} ns/row")

    print("\n-- 3. dense 3D conv blocks (bf16) --")
    dn = jax.lax.conv_dimension_numbers(
        (1, 1, 1, 1, 1), (1, 1, 1, 1, 1), ("NDHWC", "DHWIO", "NDHWC"))
    for (t_blocks, s, z, c, co) in [(4096, 12, 41, 32, 32),
                                    (4096, 16, 41, 32, 32),
                                    (2048, 12, 21, 64, 64),
                                    (1024, 12, 11, 128, 128),
                                    (512, 12, 5, 256, 256),
                                    (512, 12, 5, 256, 256)]:
        x = jax.random.normal(key, (t_blocks, z, s, s, c), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, 3, c, co), jnp.bfloat16)
        f = functools.partial(
            jax.lax.conv_general_dilated, window_strides=(1, 1, 1),
            padding="SAME", dimension_numbers=dn)

        def op(cr, x=x, w=w, f=f):
            y = f(x, w * cr[1])
            return jnp.sum(y.astype(jnp.float32)), cr[1] + 1
        t = timeit_loop(op, (jnp.float32(0), jnp.bfloat16(1)))
        flops = 2 * t_blocks * z * s * s * 27 * c * co
        print(f"  T={t_blocks} {s}x{s}x{z} C{c}: {t*1e3:7.3f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s")

    print("\n-- 3b. matmul-form conv: (R,Cin)x(Cin,Cout) tall GEMMs --")
    for (rows, c, co) in [(3_300_000, 32, 32), (120_000 * 27, 32, 32),
                          (800_000, 64, 64), (200_000, 128, 128)]:
        a = jax.random.normal(key, (rows, c), jnp.bfloat16)
        w = jax.random.normal(key, (c, co), jnp.bfloat16)

        def op(cr, a=a, w=w):
            y = jnp.dot(a, w * cr[1], preferred_element_type=jnp.float32)
            return jnp.sum(y), cr[1] + 1
        t = timeit_loop(op, (jnp.float32(0), jnp.bfloat16(1)))
        flops = 2 * rows * c * co
        print(f"  ({rows},{c})x({c},{co}): {t*1e3:7.3f} ms  "
              f"{flops/t/1e12:6.1f} TFLOP/s")

    print("\n-- 4. searchsorted(sort) in-loop --")
    for (tab_n, q_n) in [(120_000, 27 * 120_000), (120_000, 9 * 120_000),
                         (100_000, 9 * 100_000)]:
        tab = jnp.sort(jax.random.randint(key, (tab_n,), 0, 1 << 30,
                                          jnp.int32))
        q = jax.random.randint(key, (q_n,), 0, 1 << 30, jnp.int32)

        def op(c, tab=tab, q=q):
            s, i = c
            j = jnp.searchsorted(tab, (q + i) % (1 << 30), method="sort")
            return s + jnp.sum(j), i + 1
        t = timeit_loop(op, (jnp.int32(0), jnp.int32(0)))
        print(f"  tab={tab_n} q={q_n}: {t*1e3:7.3f} ms")

    print("\n-- 5. sort int32 in-loop --")
    for sn in [1_000_000, 4_500_000]:
        x = jax.random.randint(key, (sn,), 0, 1 << 30, jnp.int32)

        def op(c, x=x):
            s, i = c
            y = jnp.sort((x + i) % (1 << 30))
            return s + y[0], i + 1
        t = timeit_loop(op, (jnp.int32(0), jnp.int32(0)))
        print(f"  sort {sn}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
