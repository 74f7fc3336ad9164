"""Shared transformer building blocks (channels-last, flax).

Parity targets:
- PositionEmbeddingLearned (`dense_heads/transfusion_head_v2.py:480-504`,
  also used in fusion_encoder): Conv1d(2->C) + BN1d + ReLU + Conv1d(C->C)
  over coordinates — here Dense layers over (..., N, 2).
- TransformerDecoderLayer (`transfusion_head_v2.py:42`): post-norm
  self-attn (q=k=v=query+pos) + cross-attn (q=query+qpos, k=v=key+kpos)
  + FFN.
- sinusoidal position helpers used by SST and the deformable decoder.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class PositionEmbeddingLearned(nn.Module):
    """MLP over (B, N, input_channel) coordinates -> (B, N, C)."""

    num_pos_feats: int = 128
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.num_pos_feats, dtype=self.dtype, name="fc1")(xyz)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, dtype=self.dtype,
                        name="fc2")(x)


def mha(d_model: int, nhead: int, dropout: float = 0.0, name: str = "mha",
        dtype=None):
    # attention logits/softmax accumulate in float32 even under a bf16
    # policy (flax computes softmax in the module dtype, so keep the
    # qk product f32 via force_fp32_for_softmax semantics: flax's
    # MultiHeadDotProductAttention upcasts logits when dtype=None; with
    # an explicit bf16 dtype the projections run bf16 and the softmax
    # normalization is numerically safe for post-LN magnitudes).
    return nn.MultiHeadDotProductAttention(
        num_heads=nhead, qkv_features=d_model, out_features=d_model,
        dropout_rate=dropout, dtype=dtype, name=name)


class TransformerDecoderLayer(nn.Module):
    """Post-norm decoder layer over (B, N, C) queries / (B, M, C) keys."""

    d_model: int
    nhead: int
    dim_feedforward: int = 256
    dropout: float = 0.1
    activation: str = "relu"
    cross_only: bool = False
    with_self_posembed: bool = True
    with_cross_posembed: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 query_pos: Optional[jnp.ndarray],
                 key_pos: Optional[jnp.ndarray],
                 train: bool = False,
                 key_mask: Optional[jnp.ndarray] = None,
                 query_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """``key_mask`` (B, M) / ``query_mask`` (B, N): True = valid.
        Padded keys otherwise receive softmax mass (padded xyz sits at
        the origin with a learned pos embed), making outputs depend on
        the pad length."""
        det = not train
        dt = self.dtype
        act = {"relu": nn.relu,
               "gelu": lambda x: nn.gelu(x, approximate=False)}[self.activation]
        qp = PositionEmbeddingLearned(self.d_model, dtype=dt,
                                      name="self_posembed")(
            query_pos, train=train) \
            if (self.with_self_posembed and query_pos is not None) else None
        kp = PositionEmbeddingLearned(self.d_model, dtype=dt,
                                      name="cross_posembed")(
            key_pos, train=train) \
            if (self.with_cross_posembed and key_pos is not None) else None
        if dt is not None:
            query = query.astype(dt)
            key = key.astype(dt)

        def add(t, p):
            return t if p is None else t + p

        def attn_mask(m):
            # (B, M) key validity -> (B, 1, 1, M), broadcast over heads
            # and query positions (flax MHA mask semantics)
            return None if m is None else m[:, None, None, :]

        if not self.cross_only:
            q = add(query, qp)
            attn = mha(self.d_model, self.nhead, self.dropout, dtype=dt,
                       name="self_attn")(q, q, inputs_v=q,
                                         mask=attn_mask(query_mask),
                                         deterministic=det)
            query = nn.LayerNorm(dtype=dt, name="norm1")(
                query + nn.Dropout(self.dropout, deterministic=det)(attn))
        attn = mha(self.d_model, self.nhead, self.dropout, dtype=dt,
                   name="cross_attn")(
            add(query, qp), add(key, kp), inputs_v=add(key, kp),
            mask=attn_mask(key_mask), deterministic=det)
        query = nn.LayerNorm(dtype=dt, name="norm2")(
            query + nn.Dropout(self.dropout, deterministic=det)(attn))
        ff = nn.Dense(self.dim_feedforward, dtype=dt, name="linear1")(query)
        ff = nn.Dropout(self.dropout, deterministic=det)(act(ff))
        ff = nn.Dense(self.d_model, dtype=dt, name="linear2")(ff)
        query = nn.LayerNorm(dtype=dt, name="norm3")(
            query + nn.Dropout(self.dropout, deterministic=det)(ff))
        return query


def sine_pos_embed_1d(vals: jnp.ndarray, dim: int,
                      temperature: float = 10000.0) -> jnp.ndarray:
    """(...,) values -> (..., dim) interleaved sin/cos embedding
    (`fusion_encoder.py:gen_sineembed_for_position` per-axis core)."""
    i = np.arange(dim, dtype=np.float32)
    inv = temperature ** (2 * (i // 2) / dim)
    x = vals[..., None] / jnp.asarray(inv)
    return jnp.stack([jnp.sin(x[..., 0::2]), jnp.cos(x[..., 1::2])],
                     axis=-1).reshape(vals.shape + (dim,))
