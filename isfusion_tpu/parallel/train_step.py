"""SPMD train/eval steps over a device mesh.

The train step is built with ``shard_map`` over the ``data`` axis so the
``data`` axis name is bound inside the step: sync-BatchNorm layers psum
their statistics (NaiveSyncBN parity) and gradients are pmean'd — the whole
reference OptimizerHook + DDP-allreduce pipeline compiles into one XLA
program per step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation
               ) -> "TrainState":
        params = variables["params"]
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=variables.get("batch_stats", {}),
                   opt_state=tx.init(params))


def total_loss(losses: dict) -> jnp.ndarray:
    """Sum entries whose key contains 'loss' (mmcv parse_losses semantics —
    other entries, e.g. matched_ious, are diagnostics)."""
    return sum(jnp.sum(v) for k, v in losses.items() if "loss" in k)


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    donate: bool = True) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    With a mesh, the step is shard_map'd over the 'data' axis: batch sharded,
    state replicated, grads pmean'd. Without a mesh, runs single-device.
    """

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        losses, mutated = model.apply(
            variables, batch, train=True, mode="loss",
            mutable=["batch_stats"], rngs={"dropout": rng})
        loss = total_loss(losses)
        return loss, (losses, mutated.get("batch_stats", batch_stats))

    def step_impl(state: TrainState, batch: dict, rng) -> tuple:
        if mesh is not None:
            # distinct dropout per data shard
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            losses = jax.lax.pmean(losses, "data")
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=params,
                                  batch_stats=new_bs, opt_state=opt_state)
        metrics = dict(loss=loss, **losses)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_impl, donate_argnums=(0,) if donate else ())

    sharded = shard_map(
        step_impl, mesh=mesh,
        in_specs=(P(), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_eval_step(model, mesh: Optional[Mesh] = None) -> Callable:
    """Returns predict(state, batch) -> per-sample predictions dict."""

    def eval_impl(state: TrainState, batch: dict):
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        return model.apply(variables, batch, train=False, mode="predict")

    if mesh is None:
        return jax.jit(eval_impl)
    sharded = shard_map(eval_impl, mesh=mesh,
                        in_specs=(P(), P("data")), out_specs=P("data"),
                        check_vma=False)
    return jax.jit(sharded)
