"""SST (single-stride transformer) regional attention, TPU-native.

Parity: `mmdet3d/models/sst/sst_basic_block_v2.py` (WindowAttention:14,
EncoderLayer:77, BasicShiftBlockV2:129), `mmdet3d/models/backbones/sst_v2.py`
(SSTv2:12) and the regional grouping of `mmdet3d/models/sst/
sst_input_layer_v2.py` + `mmdet3d/ops/sst/sst_ops.py:get_window_coors:220`.

IS-Fusion applies SST to the *dense* fused BEV (every cell is a token and
window_shape (6,6,1) with max_tokens 36 keeps every window full — see
`fusion_encoder.py:1165-1190`), so the reference's CUDA window-partition /
token-drop machinery (ingroup_inds, flat2window_v2) reduces to static
reshapes: pad -> (B, H/w, w, W/w, w, C) -> batched MHA over 36-token
windows -> reverse. The shifted variant offsets the grid by window//2 and
masks padded border tokens — identical math to the sparse reference on a
dense input, and exactly what the TPU wants (one fused attention over
[B*num_windows, 36, C]).

Sinusoidal in-window position embedding matches `sst_input_layer_v2.py:
get_pos_embed:224` (x/y offsets from window center, temperature 1000).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...registry import BACKBONES
from ..layers import resolve_dtype


def sst_window_pos_embed(window_shape: Tuple[int, int], feat_dim: int,
                         pos_temperature: float = 1000.0,
                         normalize_pos: bool = False) -> np.ndarray:
    """Static (wy*wx, feat_dim) table of in-window sinusoidal embeddings.

    Mirrors `get_pos_embed` (`sst_input_layer_v2.py:224-292`): offsets from
    the window center, per-axis sin/cos with temperature, x then y halves.
    """
    win_x, win_y = int(window_shape[0]), int(window_shape[1])
    yy, xx = np.meshgrid(np.arange(win_y), np.arange(win_x), indexing="ij")
    x = (xx.reshape(-1) - win_x / 2).astype(np.float32)
    y = (yy.reshape(-1) - win_y / 2).astype(np.float32)
    if normalize_pos:
        x = x / win_x * 2 * np.pi
        y = y / win_y * 2 * np.pi
    pos_length = feat_dim // 2
    inv_freq = pos_temperature ** (
        2 * (np.arange(pos_length, dtype=np.float32) // 2) / pos_length)
    ex = x[:, None] / inv_freq[None]
    ey = y[:, None] / inv_freq[None]

    def interleave(e):
        return np.stack([np.sin(e[:, 0::2]), np.cos(e[:, 1::2])],
                        axis=-1).reshape(e.shape[0], -1)

    return np.concatenate([interleave(ex), interleave(ey)],
                          axis=-1).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int, shift: bool
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, Tuple[int, int]]:
    """(B, H, W, C) -> tokens (B*nW, ws*ws, C), valid (B*nW, ws*ws).

    Shifted partition offsets the grid by ws//2 (zero-pads the border,
    matching `get_window_coors`'s +shift indexing)."""
    b, h, w, c = x.shape
    s = ws // 2 if shift else 0
    hp = int(np.ceil((h + s) / ws)) * ws
    wp = int(np.ceil((w + s) / ws)) * ws
    x = jnp.pad(x, ((0, 0), (s, hp - h - s), (s, wp - w - s), (0, 0)))
    valid = jnp.pad(jnp.ones((b, h, w), bool),
                    ((0, 0), (s, hp - h - s), (s, wp - w - s)))
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)
    valid = valid.reshape(b, hp // ws, ws, wp // ws, ws)
    valid = valid.transpose(0, 1, 3, 2, 4).reshape(-1, ws * ws)
    return x, valid, (hp, wp)


def window_reverse(tokens: jnp.ndarray, shape_bhwc: Tuple[int, ...], ws: int,
                   shift: bool, padded_hw: Tuple[int, int]) -> jnp.ndarray:
    b, h, w, c = shape_bhwc
    hp, wp = padded_hw
    s = ws // 2 if shift else 0
    x = tokens.reshape(b, hp // ws, wp // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, s:s + h, s:s + w]


class CosineMultiHeadAttention(nn.Module):
    """Scaled-cosine window attention (`mmdet3d/models/sst/cosine_msa.py:
    449` + `_scaled_cosine_attention:123-170`): q and k are L2-normalized
    per head, logits = cosine similarity divided by a LEARNED temperature
    ``tau`` clamped at ``tau_min`` (shared across heads, or per-head with
    ``non_shared_tau``). Selected in the reference via
    ``layer_cfg=dict(cosine=True)`` (`sst_basic_block_v2.py:20-27`)."""

    num_heads: int
    qkv_features: int
    out_features: int
    dropout_rate: float = 0.0
    tau_min: float = 0.01
    non_shared_tau: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs_q, inputs_k=None, inputs_v=None, mask=None,
                 deterministic: bool = True):
        inputs_k = inputs_q if inputs_k is None else inputs_k
        inputs_v = inputs_k if inputs_v is None else inputs_v
        h, dh = self.num_heads, self.qkv_features // self.num_heads

        def proj(x, name):
            y = nn.Dense(self.qkv_features, dtype=self.dtype, name=name)(x)
            return y.reshape(y.shape[:-1] + (h, dh))

        q = proj(inputs_q, "query")
        k = proj(inputs_k, "key")
        v = proj(inputs_v, "value")
        # cosine normalization + softmax in f32 (bf16 norms of near-unit
        # vectors lose the similarity resolution the learned tau divides)
        q = q.astype(jnp.float32)
        k = k.astype(jnp.float32)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-12)
        tau = self.param(
            "tau", nn.initializers.ones,
            (h,) if self.non_shared_tau else (1,))
        logits = jnp.einsum("...qhd,...khd->...hqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / jnp.maximum(
            tau, self.tau_min).reshape(1, -1, 1, 1)
        if mask is not None:
            logits = jnp.where(mask, logits, -1e9)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        w = nn.Dropout(self.dropout_rate, deterministic=deterministic)(w)
        out = jnp.einsum("...hqk,...khd->...qhd", w, v)
        out = out.reshape(out.shape[:-2] + (self.qkv_features,))
        return nn.Dense(self.out_features, dtype=self.dtype,
                        name="out")(out)


def make_window_attention(layer_cfg: Optional[dict], *, num_heads: int,
                          qkv_features: int, out_features: int,
                          dropout_rate: float, name: str,
                          dtype=None) -> nn.Module:
    """Attention factory keyed on the reference's ``layer_cfg``
    (`sst_basic_block_v2.py:14-35`): ``dict(cosine=True[, tau_min,
    non_shared_tau])`` selects scaled-cosine attention, otherwise
    standard dot-product MHA."""
    cfg = dict(layer_cfg or {})
    if cfg.get("cosine", False):
        return CosineMultiHeadAttention(
            num_heads=num_heads, qkv_features=qkv_features,
            out_features=out_features, dropout_rate=dropout_rate,
            tau_min=float(cfg.get("tau_min", 0.01)),
            non_shared_tau=bool(cfg.get("non_shared_tau", False)),
            dtype=dtype, name=name)
    if cfg.get("linear", False):
        raise NotImplementedError(
            "linear attention is NotImplementedError in the reference "
            "too (sst_basic_block_v2.py:28-33)")
    return nn.MultiHeadDotProductAttention(
        num_heads=num_heads, qkv_features=qkv_features,
        out_features=out_features, dropout_rate=dropout_rate,
        dtype=dtype, name=name)


class _SSTEncoderLayer(nn.Module):
    """Window MHA (q=k=feat+pos, v=feat) + FFN, post-norm
    (`sst_basic_block_v2.py:77`)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    window_size: int
    shift: bool
    dropout: float = 0.0
    pos_temperature: float = 1000.0
    normalize_pos: bool = False
    layer_cfg: Any = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        det = not train
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        shape = x.shape
        ws = self.window_size
        tokens, valid, padded = window_partition(x, ws, self.shift)
        pos = jnp.asarray(sst_window_pos_embed(
            (ws, ws), self.d_model, self.pos_temperature,
            self.normalize_pos), tokens.dtype)
        q = tokens + pos[None]
        # key padding mask: padded tokens attend nowhere / are not attended
        mask = valid[:, None, None, :] & valid[:, None, :, None]
        attn = make_window_attention(
            self.layer_cfg, num_heads=self.nhead,
            qkv_features=self.d_model, out_features=self.d_model,
            dropout_rate=self.dropout, dtype=dt,
            name="win_attn")(q, q, inputs_v=tokens, mask=mask,
                             deterministic=det)
        attn = jnp.where(valid[..., None], attn, 0.0)
        tokens = nn.LayerNorm(dtype=dt, name="norm1")(
            tokens + nn.Dropout(self.dropout, deterministic=det)(attn))
        ff = nn.Dense(self.dim_feedforward, dtype=dt,
                      name="linear1")(tokens)
        ff = nn.Dense(self.d_model, dtype=dt, name="linear2")(nn.relu(ff))
        tokens = nn.LayerNorm(dtype=dt, name="norm2")(
            tokens + nn.Dropout(self.dropout, deterministic=det)(ff))
        tokens = jnp.where(valid[..., None], tokens, 0.0)
        return window_reverse(tokens, shape, ws, self.shift, padded)


@BACKBONES.register_module()
class SSTv2(nn.Module):
    """Shifted-window BEV attention backbone over dense (B, H, W, C) maps.

    ``num_blocks`` BasicShiftBlockV2 equivalents; each block = no-shift
    layer + shifted layer. ``in_channel`` adds the reference's input linear
    projection (`sst_v2.py`)."""

    d_model: Any = (128,)
    nhead: Any = (8,)
    num_blocks: int = 1
    dim_feedforward: Any = (128,)
    window_shape: Tuple[int, int, int] = (6, 6, 1)
    output_shape: Optional[Sequence[int]] = None
    in_channel: Optional[int] = None
    dropout: float = 0.0
    pos_temperature: float = 1000.0
    normalize_pos: bool = False
    layer_cfg: Any = None   # dict(cosine=True, ...) -> CosineMSA
    with_cp: bool = True   # remat window-attention layers in training
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        d = self.d_model[0] if isinstance(self.d_model, (tuple, list)) \
            else int(self.d_model)
        nh = self.nhead[0] if isinstance(self.nhead, (tuple, list)) \
            else int(self.nhead)
        ff = self.dim_feedforward[0] \
            if isinstance(self.dim_feedforward, (tuple, list)) \
            else int(self.dim_feedforward)
        ws = int(self.window_shape[0])
        dt = resolve_dtype(self.compute_dtype)
        if self.in_channel is not None:
            x = nn.Dense(d, dtype=dt, name="linear0")(x)
        layer_cls = nn.remat(_SSTEncoderLayer, static_argnums=(2,)) \
            if self.with_cp else _SSTEncoderLayer
        for b in range(self.num_blocks):
            for li, shift in enumerate((False, True)):
                x = layer_cls(
                    d, nh, ff, ws, shift, self.dropout,
                    self.pos_temperature, self.normalize_pos,
                    self.layer_cfg, dt,
                    name=f"block{b}_layer{li}")(x, train)
        return x


@BACKBONES.register_module()
class SRABlock(nn.Module):
    """Sparse-regional-attention block (`mmdet3d/models/sst/sra_block.py:
    101-137`): two encoder layers, no-shift then shift. The legacy
    SRATensor window bookkeeping (`ops/sst/sst_ops.py:289`) reduces to
    the same static window partition used by SSTv2 on dense BEV maps, so
    the block is the reference's BasicShiftBlock math over (B, H, W, C)
    input."""

    d_model: int
    nhead: int
    dim_feedforward: int
    window_shape: Tuple[int, int, int] = (6, 6, 1)
    dropout: float = 0.0
    layer_cfg: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        ws = int(self.window_shape[0])
        for li, shift in enumerate((False, True)):
            x = _SSTEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward, ws,
                shift, self.dropout, layer_cfg=self.layer_cfg,
                name=f"encoder_{li}")(x, train)
        return x
