"""Proposal samplers for two-stage training.

Parity: `mmdet3d/core/bbox/samplers/iou_neg_piecewise_sampler.py:9` —
PartA2's second stage samples a fixed budget of proposals: positives at
random up to num * pos_fraction, negatives split into IoU bands with
per-band fractions (shortfalls in easier bands extend the harder ones).
TPU-static: returns fixed-size index arrays + validity masks so the
consumer keeps static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...registry import BBOX_SAMPLERS


def _masked_choice(rng, mask: jnp.ndarray, k: int):
    """k indices drawn without replacement from `mask`'s True positions
    (random priority sort); returns (idx (k,), valid (k,))."""
    n = mask.shape[0]
    pri = jnp.where(mask, jax.random.uniform(rng, (n,)), -1.0)
    _, order = jax.lax.top_k(pri, k)
    valid = jnp.take(mask, order)
    return order, valid


@BBOX_SAMPLERS.register_module()
class PseudoSampler:
    """All positives kept, no sampling (mmdet PseudoSampler)."""

    def sample(self, rng, gt_inds: jnp.ndarray,
               max_overlaps: Optional[jnp.ndarray] = None):
        pos = gt_inds > 0
        idx = jnp.arange(gt_inds.shape[0])
        return dict(pos_inds=idx, pos_valid=pos, neg_inds=idx,
                    neg_valid=gt_inds == 0)


@BBOX_SAMPLERS.register_module()
class IoUNegPiecewiseSampler:
    """IoU piece-wise negative sampling (`iou_neg_piecewise_sampler.py`).

    neg_iou_piece_thrs gives each band's UPPER IoU bound; band i covers
    [thr_{i+1}, thr_i) with the last band reaching down to 0. Shortfalls
    extend the next band's budget, mirroring the reference's extend_num.
    """

    def __init__(self, num: int, pos_fraction: float = 0.5,
                 neg_piece_fractions: Sequence[float] = (0.8, 0.2),
                 neg_iou_piece_thrs: Sequence[float] = (0.55, 0.1),
                 neg_pos_ub: float = -1,
                 add_gt_as_proposals: bool = False,
                 return_iou: bool = False):
        assert len(neg_piece_fractions) == len(neg_iou_piece_thrs)
        self.num = int(num)
        self.pos_fraction = float(pos_fraction)
        self.neg_piece_fractions = [float(f) for f in neg_piece_fractions]
        self.neg_iou_thr = [float(t) for t in neg_iou_piece_thrs]
        self.return_iou = return_iou

    def sample(self, rng, gt_inds: jnp.ndarray,
               max_overlaps: jnp.ndarray) -> dict:
        """gt_inds (N,): 0 = negative, >0 = matched gt index + 1;
        max_overlaps (N,): best IoU per proposal. Returns fixed-size
        pos/neg index arrays with validity masks."""
        r_pos, r_neg = jax.random.split(rng)
        num_pos = int(self.num * self.pos_fraction)
        num_neg = self.num - num_pos
        pos_inds, pos_valid = _masked_choice(r_pos, gt_inds > 0, num_pos)

        neg_mask = gt_inds == 0
        bands = []
        n_b = len(self.neg_iou_thr)
        for i in range(n_b):
            hi = self.neg_iou_thr[i]
            lo = self.neg_iou_thr[i + 1] if i + 1 < n_b else 0.0
            bands.append(neg_mask & (max_overlaps >= lo) &
                         (max_overlaps < hi))

        chosen = jnp.zeros((0,), jnp.int32)
        chosen_valid = jnp.zeros((0,), bool)
        budgets = [int(num_neg * f) for f in self.neg_piece_fractions]
        budgets[-1] = num_neg - sum(budgets[:-1])
        keys = jax.random.split(r_neg, n_b)
        # static budgets; the reference's dynamic extend_num becomes a
        # final top-off draw over ALL negatives for unfilled slots
        for i in range(n_b):
            idx, val = _masked_choice(keys[i], bands[i], budgets[i])
            chosen = jnp.concatenate([chosen, idx.astype(jnp.int32)])
            chosen_valid = jnp.concatenate([chosen_valid, val])
        # top-off: replace invalid slots with random negatives NOT chosen
        # by the band draws (the reference samples without replacement —
        # drawing from all negatives here could duplicate a band pick and
        # double-count its loss contribution, r3 review fix)
        short = ~chosen_valid
        taken = jnp.zeros_like(neg_mask).at[chosen].set(
            chosen_valid, mode="drop")
        fill_idx, fill_val = _masked_choice(
            jax.random.fold_in(r_neg, 7), neg_mask & ~taken, num_neg)
        chosen = jnp.where(short, fill_idx.astype(jnp.int32), chosen)
        chosen_valid = chosen_valid | (short & fill_val)
        out = dict(pos_inds=pos_inds, pos_valid=pos_valid,
                   neg_inds=chosen, neg_valid=chosen_valid)
        if self.return_iou:
            out["iou"] = jnp.concatenate(
                [max_overlaps[pos_inds], max_overlaps[chosen]])
        return out
