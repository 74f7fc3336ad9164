"""Mixed-precision policy helpers.

TPU-first replacement for the reference's scattered fp16-guard decorators
(`mmdet3d/models/middle_encoders/fusion_encoder.py` auto_fp16 wrappers,
SURVEY.md §7 P6): one policy — bfloat16 compute with float32 masters —
applied by casting the variable tree at the inference boundary. bf16 needs
no loss scaling on TPU (8-bit exponent), so unlike the reference's fp16
path there is no guard machinery to replicate.

Numerics-critical segments keep float32 regardless of policy:
- attention logit accumulation (einsums carry
  ``preferred_element_type=float32`` at the call sites);
- box decode / NMS (heads cast their outputs back to float32 before
  `get_bboxes`, see `TransFusionHeadV2.get_bboxes`);
- the Hungarian cost matrices (host callback, float64/float32 already).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast every floating-point leaf of a pytree to ``dtype`` (integer
    and bool leaves pass through)."""
    def cast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)


def cast_batch_floating(batch: dict, dtype=jnp.bfloat16,
                        keep_f32=("lidar2img", "calib", "gt_bboxes_3d")
                        ) -> dict:
    """Cast a data batch's floating arrays; calibration matrices and GT
    boxes stay float32 (projection/targets precision)."""
    out = {}
    for k, v in batch.items():
        v = jnp.asarray(v) if not isinstance(v, dict) else v
        if isinstance(v, dict) or k in keep_f32 or \
                not jnp.issubdtype(v.dtype, jnp.floating):
            out[k] = v
        else:
            out[k] = v.astype(dtype)
    return out
