"""Optimizer + schedule construction from mmcv-style configs.

Parity targets:
- AdamW + ``paramwise_cfg`` custom_keys lr_mult (reference flagship config
  `configs/isfusion/isfusion_0075voxel.py:398-401`, img_backbone lr x0.1);
- grad clip max_norm (`optimizer_config`, config:403);
- cyclic one-cycle LR and momentum (`lr_config`/`momentum_config`,
  config:404-413 — mmcv CyclicLrUpdater semantics);
- step LR with linear warmup (schedule_2x).

Implemented with optax; the b1 (momentum) cyclic schedule uses
``optax.inject_hyperparams`` over adamw.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax


def _cyclic_schedule(base: float, target_ratio, cyclic_times: int,
                     step_ratio_up: float, total_steps: int) -> Callable:
    """mmcv cyclic policy: base -> base*r_up over the up phase, then down to
    base*r_down; cosine annealing within each phase (mmcv default)."""
    r_up, r_down = float(target_ratio[0]), float(target_ratio[1])
    period = max(total_steps // max(cyclic_times, 1), 1)
    up = max(int(period * step_ratio_up), 1)

    def sched(count):
        t = jnp.mod(count, period)
        # cosine interpolation helpers
        def cos_anneal(start, end, frac):
            return end + (start - end) * 0.5 * (jnp.cos(jnp.pi * frac) + 1)
        frac_up = jnp.clip(t / up, 0.0, 1.0)
        frac_down = jnp.clip((t - up) / max(period - up, 1), 0.0, 1.0)
        lr_up = cos_anneal(base, base * r_up, frac_up)
        lr_down = cos_anneal(base * r_up, base * r_down, frac_down)
        return jnp.where(t < up, lr_up, lr_down)

    return sched


def build_lr_schedule(lr_config: Optional[dict], base_lr: float,
                      total_steps: int,
                      steps_per_epoch: int = 1) -> Callable:
    if not lr_config:
        return optax.constant_schedule(base_lr)
    cfg = dict(lr_config)
    policy = cfg.get("policy", "fixed")
    if policy == "cyclic":
        return _cyclic_schedule(base_lr, cfg.get("target_ratio", (10, 1e-4)),
                                int(cfg.get("cyclic_times", 1)),
                                float(cfg.get("step_ratio_up", 0.4)),
                                total_steps)
    if policy == "step":
        milestones = [int(e) * steps_per_epoch for e in cfg.get("step", [])]
        gamma = float(cfg.get("gamma", 0.1))
        sched = optax.piecewise_constant_schedule(
            base_lr, {m: gamma for m in milestones})
        warmup_iters = int(cfg.get("warmup_iters", 0))
        if cfg.get("warmup") == "linear" and warmup_iters > 0:
            ratio = float(cfg.get("warmup_ratio", 1e-3))
            warm = optax.linear_schedule(base_lr * ratio, base_lr,
                                         warmup_iters)
            return optax.join_schedules([warm, sched], [warmup_iters])
        return sched
    if policy in ("CosineAnnealing", "cosine"):
        min_ratio = float(cfg.get("min_lr_ratio", 1e-3))
        warmup_iters = int(cfg.get("warmup_iters", 0))
        cos = optax.cosine_decay_schedule(base_lr,
                                          max(total_steps - warmup_iters, 1),
                                          alpha=min_ratio)
        if cfg.get("warmup") == "linear" and warmup_iters > 0:
            ratio = float(cfg.get("warmup_ratio", 1e-3))
            warm = optax.linear_schedule(base_lr * ratio, base_lr,
                                         warmup_iters)
            return optax.join_schedules([warm, cos], [warmup_iters])
        return cos
    return optax.constant_schedule(base_lr)


def build_momentum_schedule(momentum_config: Optional[dict], base_b1: float,
                            total_steps: int) -> Optional[Callable]:
    if not momentum_config:
        return None
    cfg = dict(momentum_config)
    if cfg.get("policy") == "cyclic":
        return _cyclic_schedule(base_b1, cfg.get("target_ratio", (0.85, 1)),
                                int(cfg.get("cyclic_times", 1)),
                                float(cfg.get("step_ratio_up", 0.4)),
                                total_steps)
    return None


def _lr_mult_mask(params, custom_keys: Dict[str, dict]):
    """Per-leaf multiplier from paramwise_cfg custom_keys prefixes
    (key matches if it appears in the '/'-joined param path)."""

    def mult_for(path: str) -> float:
        m = 1.0
        for key, kcfg in custom_keys.items():
            if key in path:
                m = float(kcfg.get("lr_mult", 1.0))
        return m

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [mult_for(jax.tree_util.keystr(kp)) for kp, _ in flat])


def build_hybrid_optimizer(params, constructor_cfg: dict,
                           total_steps: int = 10000
                           ) -> optax.GradientTransformation:
    """HybridOptimizer parity (`mmdet3d/core/optimizer/hybrid_constructor
    .py:9`): independent optimizers (and step intervals) per param-name
    prefix branch, e.g. a slower/img-specific optimizer for the camera
    backbone. Implemented as optax.multi_transform over a prefix->label
    partition; step intervals map to optax.MultiSteps per branch."""
    branches = dict(constructor_cfg.get("branches", {}))
    default_cfg = dict(constructor_cfg.get(
        "default", dict(type="AdamW", lr=1e-4, weight_decay=0.01)))

    def make(cfg):
        cfg = dict(cfg)
        interval = int(cfg.pop("step_interval", 1))
        tx = build_optimizer(params, cfg, total_steps=total_steps)
        if interval > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=interval)
        return tx

    transforms = {"default": make(default_cfg)}
    for name, cfg in branches.items():
        transforms[name] = make(cfg)

    def label_for(path: str) -> str:
        for name in branches:
            if name in path:
                return name
        return "default"

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    labels = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [label_for(jax.tree_util.keystr(kp)) for kp, _ in flat])
    return optax.multi_transform(transforms, labels)


def build_optimizer(params, optimizer_cfg: dict,
                    optimizer_config: Optional[dict] = None,
                    lr_config: Optional[dict] = None,
                    momentum_config: Optional[dict] = None,
                    total_steps: int = 10000,
                    steps_per_epoch: int = 1) -> optax.GradientTransformation:
    cfg = dict(optimizer_cfg)
    opt_type = cfg.pop("type", "AdamW")
    base_lr = float(cfg.pop("lr", 1e-3))
    weight_decay = float(cfg.pop("weight_decay", 0.01))
    paramwise = cfg.pop("paramwise_cfg", None) or {}
    custom_keys = dict(paramwise.get("custom_keys", {}))

    lr_sched = build_lr_schedule(lr_config, base_lr, total_steps,
                                 steps_per_epoch)
    betas = tuple(float(b) for b in cfg.pop("betas", (0.9, 0.999)))
    b1_sched = build_momentum_schedule(momentum_config, betas[0],
                                       total_steps)

    chain = []
    clip = (optimizer_config or {}).get("grad_clip")
    if clip:
        chain.append(optax.clip_by_global_norm(float(clip["max_norm"])))

    # configured betas forward into the optimizer in every branch (they
    # were previously popped for the momentum schedule's base value and
    # silently dropped otherwise — r3 review fix)
    if opt_type.lower() == "adamw":
        if b1_sched is not None:
            inner = optax.inject_hyperparams(optax.adamw)(
                learning_rate=lr_sched, b1=b1_sched, b2=betas[1],
                weight_decay=weight_decay)
        else:
            inner = optax.adamw(lr_sched, b1=betas[0], b2=betas[1],
                                weight_decay=weight_decay)
    elif opt_type.lower() == "sgd":
        inner = optax.sgd(lr_sched, momentum=float(cfg.get("momentum", 0.9)))
    elif opt_type.lower() == "adam":
        inner = optax.adam(lr_sched, b1=betas[0], b2=betas[1])
    else:
        raise ValueError(f"unsupported optimizer {opt_type}")
    chain.append(inner)

    if custom_keys:
        mults = _lr_mult_mask(params, custom_keys)
        chain.append(optax.GradientTransformation(
            lambda p: optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree_util.tree_map(lambda u, m: u * m, updates, mults),
                state)))
    return optax.chain(*chain)
