"""Loss functions (parity with mmdet losses used by the reference:
FocalLoss, GaussianFocalLoss, L1Loss, SmoothL1Loss, CrossEntropyLoss).

Pure functions over jnp arrays with explicit weight masks and ``avg_factor``
(mmdet's reduction semantics). Padding-safe: callers pass weights=0 for
padded slots.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..registry import LOSSES


def _reduce(loss: jnp.ndarray, weight: Optional[jnp.ndarray],
            reduction: str, avg_factor: Optional[jnp.ndarray]) -> jnp.ndarray:
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # mean
    if avg_factor is None:
        if weight is not None:
            denom = jnp.maximum(jnp.sum(weight), 1e-6)
        else:
            denom = loss.size
        return jnp.sum(loss) / denom
    return jnp.sum(loss) / jnp.maximum(avg_factor, 1e-6)


def sigmoid_focal_loss(pred: jnp.ndarray, target: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       gamma: float = 2.0, alpha: float = 0.25,
                       reduction: str = "mean",
                       avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sigmoid focal loss; ``target`` is one-hot (same shape as pred)."""
    p = jax.nn.sigmoid(pred)
    ce = _bce_with_logits(pred, target)
    p_t = p * target + (1 - p) * (1 - target)
    alpha_t = alpha * target + (1 - alpha) * (1 - target)
    loss = alpha_t * ((1 - p_t) ** gamma) * ce
    return _reduce(loss, weight, reduction, avg_factor)


def _bce_with_logits(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(pred, 0) - pred * target + \
        jnp.log1p(jnp.exp(-jnp.abs(pred)))


def gaussian_focal_loss(pred: jnp.ndarray, gaussian_target: jnp.ndarray,
                        weight: Optional[jnp.ndarray] = None,
                        alpha: float = 2.0, gamma: float = 4.0,
                        reduction: str = "mean",
                        avg_factor: Optional[jnp.ndarray] = None
                        ) -> jnp.ndarray:
    """CornerNet-style focal loss on gaussian heatmaps; ``pred`` is a
    probability (post-sigmoid), matching mmdet GaussianFocalLoss."""
    eps = 1e-12
    pos_weights = (gaussian_target == 1).astype(pred.dtype)
    neg_weights = (1 - gaussian_target) ** gamma
    pos_loss = -jnp.log(pred + eps) * ((1 - pred) ** alpha) * pos_weights
    neg_loss = -jnp.log(1 - pred + eps) * (pred ** alpha) * neg_weights * \
        (1 - pos_weights)
    loss = pos_loss + neg_loss
    return _reduce(loss, weight, reduction, avg_factor)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
            weight: Optional[jnp.ndarray] = None, reduction: str = "mean",
            avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    loss = jnp.abs(pred - target)
    return _reduce(loss, weight, reduction, avg_factor)


def smooth_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                   weight: Optional[jnp.ndarray] = None, beta: float = 1.0,
                   reduction: str = "mean",
                   avg_factor: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)
    return _reduce(loss, weight, reduction, avg_factor)


def cross_entropy_loss(pred: jnp.ndarray, label: jnp.ndarray,
                       weight: Optional[jnp.ndarray] = None,
                       reduction: str = "mean",
                       avg_factor: Optional[jnp.ndarray] = None,
                       use_sigmoid: bool = False) -> jnp.ndarray:
    """CE over logits. ``label`` is int class indices (softmax mode) or the
    same shape as pred (sigmoid mode)."""
    if use_sigmoid:
        loss = _bce_with_logits(pred, label.astype(pred.dtype))
        # multi-class sigmoid (pred has a trailing class axis the label
        # lacks): mean over classes; binary same-shape case: elementwise
        if loss.ndim == label.ndim + 1:
            loss = loss.mean(-1)
    else:
        logp = jax.nn.log_softmax(pred, axis=-1)
        loss = -jnp.take_along_axis(logp, label[..., None], axis=-1)[..., 0]
    return _reduce(loss, weight, reduction, avg_factor)


class _LossWrapper:
    """Config-built loss callable with bound defaults (mmdet loss modules)."""

    def __init__(self, fn, loss_weight: float = 1.0, **defaults):
        self.fn = fn
        self.loss_weight = loss_weight
        self.defaults = defaults

    def __call__(self, pred, target, weight=None, avg_factor=None, **kw):
        args = {**self.defaults, **kw}
        return self.loss_weight * self.fn(
            pred, target, weight=weight, avg_factor=avg_factor, **args)


@LOSSES.register_module(name="FocalLoss")
def _focal(use_sigmoid: bool = True, gamma: float = 2.0, alpha: float = 0.25,
           reduction: str = "mean", loss_weight: float = 1.0):
    assert use_sigmoid
    return _LossWrapper(sigmoid_focal_loss, loss_weight, gamma=gamma,
                        alpha=alpha, reduction=reduction)


@LOSSES.register_module(name="GaussianFocalLoss")
def _gfocal(alpha: float = 2.0, gamma: float = 4.0, reduction: str = "mean",
            loss_weight: float = 1.0):
    return _LossWrapper(gaussian_focal_loss, loss_weight, alpha=alpha,
                        gamma=gamma, reduction=reduction)


@LOSSES.register_module(name="L1Loss")
def _l1(reduction: str = "mean", loss_weight: float = 1.0):
    return _LossWrapper(l1_loss, loss_weight, reduction=reduction)


@LOSSES.register_module(name="SmoothL1Loss")
def _sl1(beta: float = 1.0, reduction: str = "mean", loss_weight: float = 1.0):
    return _LossWrapper(smooth_l1_loss, loss_weight, beta=beta,
                        reduction=reduction)


@LOSSES.register_module(name="CrossEntropyLoss")
def _ce(use_sigmoid: bool = False, reduction: str = "mean",
        loss_weight: float = 1.0):
    return _LossWrapper(cross_entropy_loss, loss_weight,
                        use_sigmoid=use_sigmoid, reduction=reduction)


def build_loss(cfg: dict):
    from ..registry import build_from_cfg
    return build_from_cfg(cfg, LOSSES)
