"""Tunnel-safe device timing for micro benchmarks.

Through the axon tunnel a `jax.device_get` round trip costs a variable
~30-55 ms, so `(loop of dispatches) / n` with small n inflates every
micro measurement by 5-10 ms (this bit round 3's per-op numbers). Here
the op iterates INSIDE one jitted `lax.fori_loop` dispatch (output fed
back as input so iterations serialize), and two point counts cancel the
fixed dispatch+fetch overhead:

    per_iter = (t(n2) - t(n1)) / (n2 - n1)

The op must be shape-preserving; wrap non-square ops with a projector
back to the input shape (its cost is measured too — keep it trivial or
subtract it with a second run).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def bench_loop(op, x, n1: int = 3, n2: int = 18, reps: int = 2,
               name: str = "", flops: float = 0.0, quiet: bool = False):
    """Median per-iteration ms of shape-preserving `op` over `x` (pytree).

    Returns per-iter milliseconds, or None on failure (OOM etc. —
    printed, not raised, so sweeps survive individual cases)."""
    def runner(n):
        return jax.jit(lambda v: jax.lax.fori_loop(
            0, n, lambda i, a: op(a), v), static_argnums=())

    try:
        f1 = jax.jit(lambda v: jax.lax.fori_loop(0, n1, lambda i, a: op(a), v))
        f2 = jax.jit(lambda v: jax.lax.fori_loop(0, n2, lambda i, a: op(a), v))

        def t(f):
            out = f(x)
            jax.device_get(
                jnp.sum(jax.tree_util.tree_leaves(out)[0]).ravel())
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                out = f(x)
                jax.device_get(
                    jnp.sum(jax.tree_util.tree_leaves(out)[0]).ravel())
                best = min(best, time.perf_counter() - t0)
            return best

        dt = (t(f2) - t(f1)) / (n2 - n1) * 1e3
        if not quiet:
            rate = flops / dt / 1e9 if flops else 0.0
            tail = f"   {rate:6.1f} TF/s" if flops else ""
            print(f"  {name:36s} {dt:8.2f} ms{tail}", flush=True)
        return dt
    except Exception as e:  # noqa: BLE001 — sweeps must survive OOMs
        if not quiet:
            print(f"  {name:36s} FAILED {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
        return None
