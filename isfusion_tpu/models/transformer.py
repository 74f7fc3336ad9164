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

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class PositionEmbeddingLearned(nn.Module):
    """MLP over (B, N, input_channel) coordinates -> (B, N, C)."""

    num_pos_feats: int = 128

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.num_pos_feats, name="fc1")(xyz)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(x)
        x = nn.relu(x)
        return nn.Dense(self.num_pos_feats, name="fc2")(x)


def mha(d_model: int, nhead: int, dropout: float = 0.0, name: str = "mha"):
    return nn.MultiHeadDotProductAttention(
        num_heads=nhead, qkv_features=d_model, out_features=d_model,
        dropout_rate=dropout, name=name)


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

    @nn.compact
    def __call__(self, query: jnp.ndarray, key: jnp.ndarray,
                 query_pos: Optional[jnp.ndarray],
                 key_pos: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        det = not train
        act = {"relu": nn.relu,
               "gelu": lambda x: nn.gelu(x, approximate=False)}[self.activation]
        qp = PositionEmbeddingLearned(self.d_model, name="self_posembed")(
            query_pos, train=train) \
            if (self.with_self_posembed and query_pos is not None) else None
        kp = PositionEmbeddingLearned(self.d_model, name="cross_posembed")(
            key_pos, train=train) \
            if (self.with_cross_posembed and key_pos is not None) else None

        def add(t, p):
            return t if p is None else t + p

        if not self.cross_only:
            q = add(query, qp)
            attn = mha(self.d_model, self.nhead, self.dropout,
                       name="self_attn")(q, q, inputs_v=q,
                                         deterministic=det)
            query = nn.LayerNorm(name="norm1")(
                query + nn.Dropout(self.dropout, deterministic=det)(attn))
        attn = mha(self.d_model, self.nhead, self.dropout,
                   name="cross_attn")(
            add(query, qp), add(key, kp), inputs_v=add(key, kp),
            deterministic=det)
        query = nn.LayerNorm(name="norm2")(
            query + nn.Dropout(self.dropout, deterministic=det)(attn))
        ff = nn.Dense(self.dim_feedforward, name="linear1")(query)
        ff = nn.Dropout(self.dropout, deterministic=det)(act(ff))
        ff = nn.Dense(self.d_model, name="linear2")(ff)
        query = nn.LayerNorm(name="norm3")(
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
