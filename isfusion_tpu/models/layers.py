"""Shared flax building blocks (TPU-native counterparts of mmcv bricks).

- ConvModule: conv/norm/act in configurable order (mmcv ConvModule surface).
- MaskedBatchNorm: BatchNorm over a padded (N, C) buffer with a validity
  mask — statistics exclude padding. With ``axis_name`` set it psums the
  statistics across the data-parallel mesh axis, replicating the reference's
  NaiveSyncBatchNorm1d (`mmdet3d/ops/norm.py:137`) semantics exactly.
- All 2D convs use NHWC layout (TPU-preferred).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def resolve_dtype(name) -> Optional[Dtype]:
    """Config string -> flax computation dtype (None = promote inputs).

    Modules expose ``compute_dtype: Optional[str]`` config fields
    (TPU-first replacement for the reference's scattered auto_fp16
    decorators, e.g. `mmdet3d/models/middle_encoders/fusion_encoder.py`):
    'bfloat16' computes in bf16 with float32 master params — no loss
    scaling needed on TPU (8-bit exponent)."""
    if name is None or name == "":
        return None
    return jnp.dtype(name)


def build_activation(act_cfg: Optional[dict]) -> Optional[Callable]:
    if act_cfg is None:
        return None
    # linen freezes dict attributes into Mapping subclasses
    t = act_cfg["type"].lower() if hasattr(act_cfg, "__getitem__") and \
        not isinstance(act_cfg, str) else str(act_cfg).lower()
    return {
        "relu": nn.relu,
        "gelu": lambda x: nn.gelu(x, approximate=False),
        "silu": nn.silu,
        "swish": nn.silu,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.01),
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
    }[t]


def norm_kind(norm_cfg: Optional[dict]) -> Optional[str]:
    if norm_cfg is None:
        return None
    t = norm_cfg["type"].lower()
    if t.startswith(("bn", "syncbn", "naivesyncbn")):
        return "bn"
    if t.startswith("ln"):
        return "ln"
    if t.startswith("gn"):
        return "gn"
    raise ValueError(f"unknown norm type {t}")


def is_sync_norm(norm_cfg: Optional[dict]) -> bool:
    if norm_cfg is None:
        return False
    return "sync" in norm_cfg["type"].lower()


class Norm(nn.Module):
    """Config-driven norm layer applied over the last axis (channels).

    ``dtype`` is the flax computation dtype (params stay float32 —
    bfloat16-with-float32-masters mixed precision, SURVEY.md §7 P6); norm
    statistics are always reduced in float32 regardless (flax norms
    upcast internally)."""

    norm_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kind = norm_kind(self.norm_cfg)
        if kind is None:
            return x
        cfg = self.norm_cfg
        eps = float(cfg.get("eps", 1e-5))
        if kind == "bn":
            momentum = float(cfg.get("momentum", 0.1))
            axis = self.axis_name if (is_sync_norm(cfg) and train) else None
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=1.0 - momentum, epsilon=eps,
                axis_name=axis, dtype=self.dtype)(x)
        if kind == "ln":
            return nn.LayerNorm(epsilon=eps, dtype=self.dtype)(x)
        if kind == "gn":
            return nn.GroupNorm(num_groups=int(cfg.get("num_groups", 32)),
                                epsilon=eps, dtype=self.dtype)(x)
        raise ValueError(kind)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over padded point/voxel buffers.

    x: (..., N, C) flattened to (M, C) internally; mask: (..., N) bool.
    Statistics are computed over mask-valid rows only; with ``axis_name``
    set (under shard_map/pmap) stats are averaged across devices, matching
    NaiveSyncBatchNorm1d (`mmdet3d/ops/norm.py:137-205`).
    """

    momentum: float = 0.01  # reference uses momentum 0.01 for VFE BN
    epsilon: float = 1e-3
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if train:
            m = mask.astype(jnp.float32)[..., None]
            x32 = x.astype(jnp.float32)  # bf16-safe statistics
            cnt = jnp.sum(m)
            mean = jnp.sum(x32 * m, axis=tuple(range(x.ndim - 1))) / \
                jnp.maximum(cnt, 1.0)
            meansqr = jnp.sum((x32 * m) ** 2,
                              axis=tuple(range(x.ndim - 1))) / \
                jnp.maximum(cnt, 1.0)
            if self.axis_name is not None:
                # weight stats by per-device valid counts (exact pooled stats)
                total = jax.lax.psum(cnt, self.axis_name)
                mean = jax.lax.psum(mean * cnt, self.axis_name) / \
                    jnp.maximum(total, 1.0)
                meansqr = jax.lax.psum(meansqr * cnt, self.axis_name) / \
                    jnp.maximum(total, 1.0)
            var = jnp.maximum(meansqr - mean ** 2, 0.0)
            if not self.is_initializing():
                ra_mean.value = (1 - self.momentum) * ra_mean.value + \
                    self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + \
                    self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        out = (x.astype(jnp.float32) - mean) * inv + bias
        return out.astype(x.dtype)


class ConvModule(nn.Module):
    """conv(+norm)(+act) block over NHWC tensors (mmcv ConvModule surface)."""

    out_channels: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[str, int, Tuple[int, int]] = 0
    dilation: int = 1
    groups: int = 1
    bias: Union[bool, str] = "auto"
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    order: Tuple[str, ...] = ("conv", "norm", "act")
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ks = self.kernel_size if isinstance(self.kernel_size, (tuple, list)) \
            else (self.kernel_size, self.kernel_size)
        st = self.stride if isinstance(self.stride, (tuple, list)) \
            else (self.stride, self.stride)
        if isinstance(self.padding, str):
            pad = self.padding
        else:
            p = self.padding if isinstance(self.padding, (tuple, list)) \
                else (self.padding, self.padding)
            pad = [(p[0], p[0]), (p[1], p[1])]
        use_bias = (self.norm_cfg is None) if self.bias == "auto" \
            else bool(self.bias)
        act = build_activation(self.act_cfg)
        conv = nn.Conv(self.out_channels, ks, strides=st, padding=pad,
                       kernel_dilation=(self.dilation, self.dilation),
                       feature_group_count=self.groups, use_bias=use_bias,
                       dtype=self.dtype)
        norm = Norm(self.norm_cfg, axis_name=self.axis_name,
                    dtype=self.dtype) \
            if self.norm_cfg is not None else None
        for step in self.order:
            if step == "conv":
                x = conv(x)
            elif step == "norm" and norm is not None:
                x = norm(x, train=train)
            elif step == "act" and act is not None:
                x = act(x)
        return x


class ConvTransposeModule(nn.Module):
    """deconv(+norm)(+act) for FPN upsampling (NHWC)."""

    out_channels: int
    kernel_size: int = 2
    stride: int = 2
    bias: bool = False
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    axis_name: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ks, st = self.kernel_size, self.stride
        x = nn.ConvTranspose(self.out_channels, (ks, ks), strides=(st, st),
                             padding="SAME", use_bias=self.bias,
                             dtype=self.dtype)(x)
        if self.norm_cfg is not None:
            x = Norm(self.norm_cfg, axis_name=self.axis_name,
                     dtype=self.dtype)(x, train=train)
        act = build_activation(self.act_cfg)
        return act(x) if act is not None else x


class LinearNormAct(nn.Module):
    """Linear + masked BN1d + act over padded (..., N, C) buffers (the
    reference's PFN/VFE layer pattern)."""

    out_channels: int
    norm_cfg: Optional[dict] = None
    act_cfg: Optional[dict] = None
    bias: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.out_channels, use_bias=self.bias)(x)
        if self.norm_cfg is not None:
            cfg = self.norm_cfg
            x = MaskedBatchNorm(
                momentum=float(cfg.get("momentum", 0.01)),
                epsilon=float(cfg.get("eps", 1e-3)),
                axis_name=self.axis_name if is_sync_norm(cfg) else None,
            )(x, mask, train=train)
        act = build_activation(self.act_cfg)
        if act is not None:
            x = act(x)
        return jnp.where(mask[..., None], x, 0.0)
