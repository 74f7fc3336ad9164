"""Microbenchmark: run-descriptor DMA gather vs XLA gather (round-3 lever).

The sparse column engine's hot residual is the fat-row gather
(`ops/sparse_cols.py:_gather_rows`): XLA's TPU gather engine moves
(V, Z*C) rows at ~75 GB/s (measured round 2) against an 819 GB/s chip.
The slot indices are NEAR-MONOTONE (y+-1 neighbors of a sorted unique
BEV-id table advance by ~1 per slot), so consecutive output rows mostly
read consecutive source rows — a structure XLA gather can't exploit but
chunked DMA can: aligned chunks of R output rows whose sources are
consecutive become ONE dma of R*F elements; ragged chunks fall back to
per-row DMAs.

Run on the TPU chip:  python tools/analysis_tools/micro_dma_gather.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_dma_gather(v, f, n, dtype, block=512, run=8):
    """Build a jitted (src (v,f), idx (n,), fmask (n,1)) -> out (n,f)."""
    assert n % block == 0 and block % run == 0 and f % 2 == 0
    f2 = f // 2
    cpb = block // run

    def kernel(idx_ref, starts_ref, isrun_ref, src_ref, fm_ref, out_ref,
               sems):
        i = pl.program_id(0)

        def chunk_copy(ch, c):
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(starts_ref[ch], run)],
                out_ref.at[pl.ds(c * run, run)],
                sems.at[c])

        def row_copy(ch, c, k):
            return pltpu.make_async_copy(
                src_ref.at[idx_ref[ch * run + k]],
                out_ref.at[c * run + k],
                sems.at[c])

        def issue(c, _):
            ch = i * cpb + c

            @pl.when(isrun_ref[ch] == 1)
            def _():
                chunk_copy(ch, c).start()

            @pl.when(isrun_ref[ch] == 0)
            def _():
                def row(k, _):
                    row_copy(ch, c, k).start()
                    return 0
                jax.lax.fori_loop(0, run, row, 0)
            return 0

        def wait(c, _):
            ch = i * cpb + c

            @pl.when(isrun_ref[ch] == 1)
            def _():
                chunk_copy(ch, c).wait()

            @pl.when(isrun_ref[ch] == 0)
            def _():
                def row(k, _):
                    row_copy(ch, c, k).wait()
                    return 0
                jax.lax.fori_loop(0, run, row, 0)
            return 0

        jax.lax.fori_loop(0, cpb, issue, 0)
        jax.lax.fori_loop(0, cpb, wait, 0)
        out_ref[:] = out_ref[:] * fm_ref[:]

    # 3D (v, 2, f//2) source layout: a 2D (v, f) HBM operand gets an
    # (8/16, 128)-tiled layout whose 1-row dynamic slice Mosaic cannot
    # express (tpu.memref_slice INTERNAL error); with the gather axis as
    # a pure leading dim every row is its own tile set. dim-1 must be 2
    # (not 1) because bf16 tiling packs sublanes in pairs ("Slice shape
    # along dimension 1 must be aligned to tiling (2)").
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block, 2, 1), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block, 2, f2), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((cpb,))],
    )
    inner = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 2, f2), dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True))

    @jax.jit
    def gather(src, idx, fmask):
        idxc = idx.reshape(-1, run)
        starts = idxc[:, 0]
        is_run = jnp.all(
            idxc == starts[:, None] + jnp.arange(run, dtype=idx.dtype)[None],
            axis=1)
        is_run &= starts + run <= v
        is_run &= jnp.all(fmask.reshape(-1, run) > 0, axis=1)
        safe_idx = jnp.minimum(idx, v - 1)
        safe_starts = jnp.minimum(starts, v - run)
        return inner(safe_idx.astype(jnp.int32),
                     safe_starts.astype(jnp.int32),
                     is_run.astype(jnp.int32), src.reshape(v, 2, f2),
                     jnp.broadcast_to(fmask.astype(dtype).reshape(n, 1, 1),
                                      (n, 2, 1))).reshape(n, f)

    return gather


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    # f padded to a 256-element multiple: Mosaic requires the DMA slice's
    # lane dim (f//2 for bf16) to be 128-aligned (41*32=1312 -> 1536, +17%)
    z, c = 48, 32
    v = 145_000
    f = z * c
    n = 145_408       # multiple of 512
    dtype = jnp.bfloat16

    src = jnp.asarray(rng.standard_normal((v, f)), dtype)
    # near-monotone indices: mostly slot+1 steps with occasional jumps,
    # matching the y+-1 rulebook structure (~90% found, runs of ~20-200)
    steps = np.ones(n, np.int64)
    jumps = rng.uniform(size=n) < 0.01
    steps[jumps] = rng.integers(2, 50, jumps.sum())
    idx = np.cumsum(steps) % v
    found = rng.uniform(size=n) > 0.08
    fmask = jnp.asarray(found[:, None], jnp.float32)
    idx_j = jnp.asarray(np.where(found, idx, 0), jnp.int32)

    bytes_moved = n * f * src.dtype.itemsize * 2   # read + write

    @jax.jit
    def xla_gather(s, i, m):
        return s.at[i].get(unique_indices=False,
                           mode="promise_in_bounds") * m.astype(s.dtype)

    t = timeit(xla_gather, src, idx_j, fmask)
    print(f"xla gather        : {t * 1e3:7.2f} ms  "
          f"{bytes_moved / t / 1e9:6.1f} GB/s")

    @jax.jit
    def memcpy(s):
        return s[:n] * 1.0001

    t = timeit(memcpy, src)
    print(f"contig copy bound : {t * 1e3:7.2f} ms  "
          f"{bytes_moved / t / 1e9:6.1f} GB/s")

    for run in (8, 16, 32):
        for block in (512, 1024):
            if block % run:
                continue
            try:
                g = make_dma_gather(v, f, n, dtype, block=block, run=run)
                t = timeit(g, src, idx_j, fmask)
                # correctness spot check
                got = np.asarray(g(src, idx_j, fmask), np.float32)
                want = np.asarray(src, np.float32)[np.asarray(idx_j)] * \
                    found[:, None]
                err = np.abs(got - want).max()
                print(f"dma run={run:2d} blk={block:4d}: {t * 1e3:7.2f} ms  "
                      f"{bytes_moved / t / 1e9:6.1f} GB/s  maxerr={err:.3g}")
            except Exception as e:   # noqa: BLE001
                print(f"dma run={run:2d} blk={block:4d}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
