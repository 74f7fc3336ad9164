"""Numerical forward-parity of the full checkpoint converter.

For flagship modules, the reference math is re-typed here in plain torch
(from `/root/reference/mmdet3d/models/...`, cited per oracle), a
reference-layout state_dict is initialized randomly, converted with
`runner/full_ckpt_convert.py`, and the flax module's output is asserted
to agree with the torch oracle on identical inputs — upgrading the
converter from a shape claim to a numbers claim (the route to accuracy
parity when real weights arrive).

Pattern: the reference's own kernel-oracle test (`ops/test.py:32-41`).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from isfusion_tpu.runner.full_ckpt_convert import (
    convert_isfusion_torch_to_flax)

torch.manual_seed(0)


def _rand_sd(shapes: dict, seed: int = 0) -> dict:
    """Random reference-layout state_dict; *running_var strictly
    positive."""
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shp in shapes.items():
        if k.endswith("running_var"):
            v = rng.uniform(0.5, 2.0, shp)
        elif k.endswith("running_mean"):
            v = rng.normal(0, 0.5, shp)
        else:
            v = rng.normal(0, 0.5, shp)
        sd[k] = torch.tensor(v, dtype=torch.float32)
    return sd


def _convert(sd, wrapped_vars):
    out, missing = convert_isfusion_torch_to_flax(sd, wrapped_vars)
    assert not missing, f"unmatched paths: {missing}"
    return out


# ======================================================= Swin block oracle
# Re-typed from `mmdet3d/models/backbones/swin.py`: WindowMSA:20 (qkv,
# relative position bias via double_step_seq index, proj),
# ShiftWindowMSA:126 (pad, cyclic shift, -100 additive mask), SwinBlock:286
# (LN -> attn -> +res -> LN -> FFN(GELU) -> +res).
class TorchWindowMSA(torch.nn.Module):
    def __init__(self, dim, heads, ws):
        super().__init__()
        self.dim, self.heads, self.ws = dim, heads, ws
        self.scale = (dim // heads) ** -0.5
        self.qkv = torch.nn.Linear(dim, 3 * dim)
        self.proj = torch.nn.Linear(dim, dim)
        self.relative_position_bias_table = torch.nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, heads))
        # double_step_seq + flip (`swin.py:63-67,121-125`)
        seq1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
        seq2 = torch.arange(0, ws)
        ric = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
        rpi = (ric + ric.T).flip(1)
        self.register_buffer("rpi", rpi)

    def forward(self, x, mask=None):
        B, N, C = x.shape
        h = self.heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * self.scale, qkv[1], qkv[2]
        attn = q @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.rpi.reshape(-1)]
        attn = attn + bias.reshape(N, N, h).permute(2, 0, 1)[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B // nW, nW, h, N, N) + mask[None, :, None]
            attn = attn.view(-1, h, N, N)
        attn = attn.softmax(-1)
        return self.proj((attn @ v).transpose(1, 2).reshape(B, N, C))


class TorchSwinBlock(torch.nn.Module):
    def __init__(self, dim, heads, ws, shift):
        super().__init__()
        self.ws, self.shift = ws, (ws // 2 if shift else 0)
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn = TorchWindowMSA(dim, heads, ws)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.fc1 = torch.nn.Linear(dim, 4 * dim)
        self.fc2 = torch.nn.Linear(4 * dim, dim)

    def _win(self, x):
        B, H, W, C = x.shape
        ws = self.ws
        x = x.view(B, H // ws, ws, W // ws, ws, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)

    def forward(self, x, hw):
        H, W = hw
        B, L, C = x.shape
        idn = x
        x = self.norm1(x).view(B, H, W, C)
        ws = self.ws
        Hp = int(np.ceil(H / ws)) * ws
        Wp = int(np.ceil(W / ws)) * ws
        x = torch.nn.functional.pad(x, (0, 0, 0, Wp - W, 0, Hp - H))
        shift = self.shift if (Hp > ws or Wp > ws) else 0
        mask = None
        if shift:
            x = torch.roll(x, (-shift, -shift), dims=(1, 2))
            img = torch.zeros(1, Hp, Wp, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift),
                       slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift),
                            slice(-shift, None)):
                    img[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = self._win(img).squeeze(-1)
            mask = mw.unsqueeze(1) - mw.unsqueeze(2)
            mask = mask.masked_fill(mask != 0, -100.0)
        xw = self._win(x)
        xw = self.attn(xw, mask)
        x = xw.view(B, Hp // ws, Wp // ws, ws, ws, C).permute(
            0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        if shift:
            x = torch.roll(x, (shift, shift), dims=(1, 2))
        x = x[:, :H, :W].reshape(B, L, C)
        x = idn + x
        idn = x
        y = self.fc2(torch.nn.functional.gelu(self.fc1(self.norm2(x))))
        return idn + y


@pytest.mark.parametrize("shift", [False, True])
def test_swin_block_parity(shift):
    from isfusion_tpu.models.backbones.swin import SwinBlock

    dim, heads, ws, H, W = 16, 2, 4, 8, 12
    ref = TorchSwinBlock(dim, heads, ws, shift)
    base = "img_backbone.stages.0.blocks.0"
    shapes = {
        f"{base}.norm1.weight": (dim,), f"{base}.norm1.bias": (dim,),
        f"{base}.norm2.weight": (dim,), f"{base}.norm2.bias": (dim,),
        f"{base}.attn.w_msa.qkv.weight": (3 * dim, dim),
        f"{base}.attn.w_msa.qkv.bias": (3 * dim,),
        f"{base}.attn.w_msa.proj.weight": (dim, dim),
        f"{base}.attn.w_msa.proj.bias": (dim,),
        f"{base}.attn.w_msa.relative_position_bias_table":
            ((2 * ws - 1) ** 2, heads),
        f"{base}.ffn.layers.0.0.weight": (4 * dim, dim),
        f"{base}.ffn.layers.0.0.bias": (4 * dim,),
        f"{base}.ffn.layers.1.weight": (dim, 4 * dim),
        f"{base}.ffn.layers.1.bias": (dim,),
    }
    sd = _rand_sd(shapes, seed=1)
    # load the same weights into the torch oracle
    ref.load_state_dict({
        "norm1.weight": sd[f"{base}.norm1.weight"],
        "norm1.bias": sd[f"{base}.norm1.bias"],
        "norm2.weight": sd[f"{base}.norm2.weight"],
        "norm2.bias": sd[f"{base}.norm2.bias"],
        "attn.qkv.weight": sd[f"{base}.attn.w_msa.qkv.weight"],
        "attn.qkv.bias": sd[f"{base}.attn.w_msa.qkv.bias"],
        "attn.proj.weight": sd[f"{base}.attn.w_msa.proj.weight"],
        "attn.proj.bias": sd[f"{base}.attn.w_msa.proj.bias"],
        "attn.relative_position_bias_table":
            sd[f"{base}.attn.w_msa.relative_position_bias_table"],
        "fc1.weight": sd[f"{base}.ffn.layers.0.0.weight"],
        "fc1.bias": sd[f"{base}.ffn.layers.0.0.bias"],
        "fc2.weight": sd[f"{base}.ffn.layers.1.weight"],
        "fc2.bias": sd[f"{base}.ffn.layers.1.bias"],
    }, strict=False)

    ours = SwinBlock(dim=dim, num_heads=heads, window_size=ws, shift=shift)
    x = np.random.default_rng(2).normal(size=(1, H * W, dim)).astype(
        np.float32)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x), (H, W))
    wrapped = {"params": {"img_backbone_m":
                          {"stage0_block0": variables["params"]}}}
    conv = _convert(sd, wrapped)
    got = np.asarray(ours.apply(
        {"params": conv["params"]["img_backbone_m"]["stage0_block0"]},
        jnp.asarray(x), (H, W)))
    with torch.no_grad():
        want = ref(torch.tensor(x), (H, W)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-5)


# ===================================================== DynamicVFE oracle
# Re-typed from `mmdet3d/models/voxel_encoders/voxel_encoder.py:288`
# (DynamicVFE.forward: cluster-mean offsets, voxel-center offsets, per
# layer Linear(bias=False)+BN1d(eval)+ReLU, scatter-max with point<->voxel
# feature concat between layers) and `utils.py:107` (DynamicVFELayer).
def _torch_dynamic_vfe(sd, feats, vidx, vcoors, cap, voxel_size, pcr,
                       channels):
    feats = torch.tensor(feats)
    vidx = torch.tensor(vidx)
    valid = vidx < cap
    # cluster center: mean xyz per voxel (DynamicScatter average)
    nseg = cap + 1
    ids = vidx.clamp(max=cap)
    ones = torch.zeros(nseg).index_add(0, ids, valid.float())
    mean = torch.zeros(nseg, 3).index_add(
        0, ids, feats[:, :3] * valid[:, None])
    mean = mean / ones.clamp(min=1)[:, None]
    f_cluster = feats[:, :3] - mean[ids]
    # voxel center offsets from the point's own voxel coords (zyx)
    centers = torch.zeros(nseg, 3)
    vs = torch.tensor(voxel_size)
    low = torch.tensor(pcr[:3])
    vc = torch.tensor(vcoors).float()
    centers[:cap, 0] = (vc[:, 2] + 0.5) * vs[0] + low[0]
    centers[:cap, 1] = (vc[:, 1] + 0.5) * vs[1] + low[1]
    centers[:cap, 2] = (vc[:, 0] + 0.5) * vs[2] + low[2]
    f_center = feats[:, :3] - centers[ids]
    x = torch.cat([feats, f_cluster, f_center], -1)
    x = x * valid[:, None]
    vox = None
    for i, c in enumerate(channels):
        b = f"pts_voxel_encoder.vfe_layers.{i}"
        x = torch.nn.functional.linear(x, sd[b + ".linear.weight"])
        x = torch.nn.functional.batch_norm(
            x, sd[b + ".norm.running_mean"], sd[b + ".norm.running_var"],
            sd[b + ".norm.weight"], sd[b + ".norm.bias"],
            training=False, eps=1e-3)
        x = torch.relu(x)
        x = x * valid[:, None]
        vox = torch.full((nseg, c), -torch.inf).index_reduce(
            0, ids, x.masked_fill(~valid[:, None], -torch.inf), "amax",
            include_self=True)
        vox = torch.nan_to_num(vox, neginf=0.0).clamp(min=0 if False else
                                                      -torch.inf)
        vox = torch.where(torch.isfinite(vox), vox, torch.zeros(()))
        if i < len(channels) - 1:
            x = torch.cat([x, vox[ids] * valid[:, None]], -1)
    return vox[:cap].numpy()


def test_dynamic_vfe_parity():
    from isfusion_tpu.models.voxel_encoders import DynamicVFE

    P, cap = 64, 10
    voxel_size, pcr = (0.5, 0.5, 1.0), (0, 0, 0, 4, 4, 2)
    channels = [8, 8]
    rng = np.random.default_rng(3)
    feats = rng.uniform(0, 2, (P, 5)).astype(np.float32)
    vidx = rng.integers(0, cap + 1, P)          # cap = trash slot
    vcoors = np.stack([rng.integers(0, 2, cap), rng.integers(0, 8, cap),
                       rng.integers(0, 8, cap)], -1).astype(np.int32)

    shapes = {}
    in_ch = 5 + 3 + 3
    for i, c in enumerate(channels):
        b = f"pts_voxel_encoder.vfe_layers.{i}"
        ic = in_ch if i == 0 else channels[i - 1] * 2
        shapes[b + ".linear.weight"] = (c, ic)
        shapes[b + ".norm.weight"] = (c,)
        shapes[b + ".norm.bias"] = (c,)
        shapes[b + ".norm.running_mean"] = (c,)
        shapes[b + ".norm.running_var"] = (c,)
    sd = _rand_sd(shapes, seed=4)

    ours = DynamicVFE(in_channels=5, feat_channels=channels,
                      with_cluster_center=True, with_voxel_center=True,
                      voxel_size=voxel_size, point_cloud_range=pcr)
    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(feats[None]),
                          jnp.asarray(vidx[None]),
                          jnp.asarray(vcoors[None]))
    wrapped = {"params": {"pts_voxel_encoder_m": variables["params"]},
               "batch_stats": {"pts_voxel_encoder_m":
                               variables["batch_stats"]}}
    conv = _convert(sd, wrapped)
    got = np.asarray(ours.apply(
        {"params": conv["params"]["pts_voxel_encoder_m"],
         "batch_stats": conv["batch_stats"]["pts_voxel_encoder_m"]},
        jnp.asarray(feats[None]), jnp.asarray(vidx[None]),
        jnp.asarray(vcoors[None]), train=False))[0]
    want = _torch_dynamic_vfe(sd, feats, vidx, vcoors, cap, voxel_size,
                              pcr, channels)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


# ==================================================== SparseEncoder oracle
# On a FULLY-dense occupancy, spconv semantics coincide with dense 3D
# convolution (SubMConv3d == Conv3d(pad), SparseConv3d == strided Conv3d),
# so the torch oracle re-types `mmdet3d/models/middle_encoders/
# sparse_encoder.py:108-216` + `ops/sparse_block.py:199` (SparseBasicBlock)
# as Conv3d/BN3d chains with spconv2-layout (out, kz, ky, kx, in) weights.
def _t_conv3d(x, w5d, stride=1, padding=1):
    w = w5d.permute(0, 4, 1, 2, 3)     # spconv2 -> torch OIkzkykx
    return torch.nn.functional.conv3d(x, w, stride=stride, padding=padding)


def _t_bn3d(x, sd, base):
    return torch.nn.functional.batch_norm(
        x, sd[base + ".running_mean"], sd[base + ".running_var"],
        sd[base + ".weight"], sd[base + ".bias"], training=False, eps=1e-3)


def _t_basicblock(x, sd, base):
    idn = x
    y = torch.relu(_t_bn3d(_t_conv3d(x, sd[base + ".conv1.weight"]),
                           sd, base + ".bn1"))
    y = _t_bn3d(_t_conv3d(y, sd[base + ".conv2.weight"]), sd, base + ".bn2")
    return torch.relu(y + idn)


def test_sparse_encoder_parity_dense_occupancy():
    from isfusion_tpu.models.middle_encoders.sparse_encoder import (
        SparseEncoder)

    nz, ny, nx, cin = 5, 8, 8, 4
    base_ch, out_ch = 8, 16
    me = "pts_middle_encoder"
    shapes = {}

    def add_conv(base, k, ci, co, bn=True):
        shapes[base + ".0.weight"] = (co,) + k + (ci,)
        for s in (".1.weight", ".1.bias", ".1.running_mean",
                  ".1.running_var"):
            shapes[base + s] = (co,)

    def add_block(base, c):
        for j in (1, 2):
            shapes[base + f".conv{j}.weight"] = (c, 3, 3, 3, c)
            for s in (".weight", ".bias", ".running_mean", ".running_var"):
                shapes[base + f".bn{j}{s}"] = (c,)

    add_conv(f"{me}.conv_input", (3, 3, 3), cin, base_ch)
    add_block(f"{me}.encoder_layers.encoder_layer1.0", base_ch)
    add_conv(f"{me}.encoder_layers.encoder_layer1.1", (3, 3, 3), base_ch,
             16)
    add_block(f"{me}.encoder_layers.encoder_layer2.0", 16)
    add_conv(f"{me}.conv_out", (3, 1, 1), 16, out_ch)
    sd = _rand_sd(shapes, seed=5)

    ours = SparseEncoder(
        in_channels=cin, sparse_shape=(nz, ny, nx), base_channels=base_ch,
        output_channels=out_ch, encoder_channels=((base_ch, 16), (16,)),
        encoder_paddings=((1, 1), (1,)), block_type="basicblock",
        stage_cap_ratios=(1.0, 1.0), dilation_ratio=1.6)

    rng = np.random.default_rng(6)
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    coords = np.stack([zz, yy, xx], -1).reshape(-1, 3).astype(np.int32)
    V = len(coords)
    feats = rng.normal(size=(V, cin)).astype(np.float32)
    mask = np.ones(V, bool)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(feats[None]),
                          jnp.asarray(coords[None]),
                          jnp.asarray(mask[None]))
    wrapped = {"params": {"pts_middle_encoder_m": variables["params"]},
               "batch_stats": {"pts_middle_encoder_m":
                               variables["batch_stats"]}}
    conv = _convert(sd, wrapped)
    got = np.asarray(ours.apply(
        {"params": conv["params"]["pts_middle_encoder_m"],
         "batch_stats": conv["batch_stats"]["pts_middle_encoder_m"]},
        jnp.asarray(feats[None]), jnp.asarray(coords[None]),
        jnp.asarray(mask[None]), train=False))

    dense = np.zeros((1, cin, nz, ny, nx), np.float32)
    # mixed slice+advanced indexing moves the advanced axes FIRST, so the
    # indexing result is (V, cin), not (cin, V)
    dense[0, :, coords[:, 0], coords[:, 1], coords[:, 2]] = feats
    x = torch.tensor(dense)
    with torch.no_grad():
        x = torch.relu(_t_bn3d(
            _t_conv3d(x, sd[f"{me}.conv_input.0.weight"]),
            sd, f"{me}.conv_input.1"))
        x = _t_basicblock(x, sd, f"{me}.encoder_layers.encoder_layer1.0")
        x = torch.relu(_t_bn3d(_t_conv3d(
            x, sd[f"{me}.encoder_layers.encoder_layer1.1.0.weight"],
            stride=2, padding=1),
            sd, f"{me}.encoder_layers.encoder_layer1.1.1"))
        x = _t_basicblock(x, sd, f"{me}.encoder_layers.encoder_layer2.0")
        x = torch.relu(_t_bn3d(_t_conv3d(
            x, sd[f"{me}.conv_out.0.weight"], stride=(2, 1, 1),
            padding=0), sd, f"{me}.conv_out.1"))
    # (N, C, D, H, W) -> (N, H, W, D*C) channel order z*C + c
    want = x.permute(0, 3, 4, 2, 1).reshape(x.shape[0], x.shape[3],
                                            x.shape[4], -1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ============================== TransFusion decoder + FFN heads oracle
# Re-typed from `mmdet3d/models/dense_heads/transfusion_head_v2.py:42`
# (TransformerDecoderLayer: post-norm self-attn + cross-attn with learned
# position embeds + FFN), `:480-504` (PositionEmbeddingLearned: Conv1d ->
# BN1d -> ReLU -> Conv1d) and `:505` (FFN prediction branches).
def _t_posembed(sd, base, xy):
    # xy (B, N, 2) -> (B, N, C)
    x = xy.transpose(1, 2)            # (B, 2, N)
    b = base + ".position_embedding_head"
    x = torch.nn.functional.conv1d(x, sd[b + ".0.weight"],
                                   sd[b + ".0.bias"])
    x = torch.nn.functional.batch_norm(
        x, sd[b + ".1.running_mean"], sd[b + ".1.running_var"],
        sd[b + ".1.weight"], sd[b + ".1.bias"], training=False, eps=1e-5)
    x = torch.relu(x)
    x = torch.nn.functional.conv1d(x, sd[b + ".3.weight"],
                                   sd[b + ".3.bias"])
    return x.transpose(1, 2)


def _t_mha(sd, base, q, k, v, heads):
    # torch F.multi_head_attention_forward with reference in_proj layout
    out, _ = torch.nn.functional.multi_head_attention_forward(
        q.transpose(0, 1), k.transpose(0, 1), v.transpose(0, 1),
        q.shape[-1], heads, sd[base + ".in_proj_weight"],
        sd[base + ".in_proj_bias"], None, None, False, 0.0,
        sd[base + ".out_proj.weight"], sd[base + ".out_proj.bias"],
        training=False, need_weights=False)
    return out.transpose(0, 1)


def _t_ln(sd, base, x):
    return torch.nn.functional.layer_norm(
        x, (x.shape[-1],), sd[base + ".weight"], sd[base + ".bias"])


def test_transfusion_decoder_and_ffn_parity():
    from isfusion_tpu.models.transformer import TransformerDecoderLayer
    from isfusion_tpu.models.dense_heads.transfusion_head import _FFNHead

    C, heads, P, M, ffn = 16, 2, 8, 32, 32
    hb = "pts_bbox_head"
    db = f"{hb}.decoder.0"
    shapes = {}
    for attn in ("self_attn", "multihead_attn"):
        shapes[f"{db}.{attn}.in_proj_weight"] = (3 * C, C)
        shapes[f"{db}.{attn}.in_proj_bias"] = (3 * C,)
        shapes[f"{db}.{attn}.out_proj.weight"] = (C, C)
        shapes[f"{db}.{attn}.out_proj.bias"] = (C,)
    for pe in ("self_posembed", "cross_posembed"):
        b = f"{db}.{pe}.position_embedding_head"
        shapes[b + ".0.weight"] = (C, 2, 1)
        shapes[b + ".0.bias"] = (C,)
        for s in (".weight", ".bias", ".running_mean", ".running_var"):
            shapes[b + ".1" + s] = (C,)
        shapes[b + ".3.weight"] = (C, C, 1)
        shapes[b + ".3.bias"] = (C,)
    for n in ("norm1", "norm2", "norm3"):
        shapes[f"{db}.{n}.weight"] = (C,)
        shapes[f"{db}.{n}.bias"] = (C,)
    shapes[f"{db}.linear1.weight"] = (ffn, C)
    shapes[f"{db}.linear1.bias"] = (ffn,)
    shapes[f"{db}.linear2.weight"] = (C, ffn)
    shapes[f"{db}.linear2.bias"] = (C,)
    # FFN prediction heads: center (2ch) and heatmap (3 classes), 2 convs
    tasks = {"center": 2, "heatmap": 3}
    pb = f"{hb}.prediction_heads.0"
    for task, out_c in tasks.items():
        shapes[f"{pb}.{task}.0.conv.weight"] = (C, C, 1)
        shapes[f"{pb}.{task}.0.conv.bias"] = (C,)
        for s in (".weight", ".bias", ".running_mean", ".running_var"):
            shapes[f"{pb}.{task}.0.bn" + s] = (C,)
        shapes[f"{pb}.{task}.1.weight"] = (out_c, C, 1)
        shapes[f"{pb}.{task}.1.bias"] = (out_c,)
    sd = _rand_sd(shapes, seed=7)

    rng = np.random.default_rng(8)
    query = rng.normal(size=(1, P, C)).astype(np.float32)
    key = rng.normal(size=(1, M, C)).astype(np.float32)
    qpos = rng.uniform(0, 10, (1, P, 2)).astype(np.float32)
    kpos = rng.uniform(0, 10, (1, M, 2)).astype(np.float32)

    dec = TransformerDecoderLayer(C, heads, ffn, dropout=0.0)
    dvars = dec.init(jax.random.PRNGKey(0), jnp.asarray(query),
                     jnp.asarray(key), jnp.asarray(qpos),
                     jnp.asarray(kpos))
    head = _FFNHead(heads={"center": (2, 2), "heatmap": (3, 2)},
                    head_conv=C)
    hvars = head.init(jax.random.PRNGKey(1), jnp.asarray(query))
    wrapped = {
        "params": {"pts_bbox_head_m": {"decoder_0": dvars["params"],
                                       "pred_0": hvars["params"]}},
        "batch_stats": {"pts_bbox_head_m":
                        {"decoder_0": dvars["batch_stats"],
                         "pred_0": hvars["batch_stats"]}}}
    conv = _convert(sd, wrapped)

    dq = np.asarray(dec.apply(
        {"params": conv["params"]["pts_bbox_head_m"]["decoder_0"],
         "batch_stats":
             conv["batch_stats"]["pts_bbox_head_m"]["decoder_0"]},
        jnp.asarray(query), jnp.asarray(key), jnp.asarray(qpos),
        jnp.asarray(kpos), train=False))
    got = {k: np.asarray(v) for k, v in head.apply(
        {"params": conv["params"]["pts_bbox_head_m"]["pred_0"],
         "batch_stats":
             conv["batch_stats"]["pts_bbox_head_m"]["pred_0"]},
        jnp.asarray(dq), train=False).items()}

    with torch.no_grad():
        q = torch.tensor(query)
        k = torch.tensor(key)
        qp = _t_posembed(sd, f"{db}.self_posembed", torch.tensor(qpos))
        kp = _t_posembed(sd, f"{db}.cross_posembed", torch.tensor(kpos))
        x = q + qp
        a = _t_mha(sd, f"{db}.self_attn", x, x, x, heads)
        q = _t_ln(sd, f"{db}.norm1", q + a)
        a = _t_mha(sd, f"{db}.multihead_attn", q + qp, k + kp, k + kp,
                   heads)
        q = _t_ln(sd, f"{db}.norm2", q + a)
        y = torch.nn.functional.linear(q, sd[f"{db}.linear1.weight"],
                                       sd[f"{db}.linear1.bias"])
        y = torch.nn.functional.linear(torch.relu(y),
                                       sd[f"{db}.linear2.weight"],
                                       sd[f"{db}.linear2.bias"])
        want_q = _t_ln(sd, f"{db}.norm3", q + y)
        np.testing.assert_allclose(dq, want_q.numpy(), rtol=1e-4,
                                   atol=1e-5)
        for task, out_c in tasks.items():
            h = want_q.transpose(1, 2)
            h = torch.nn.functional.conv1d(
                h, sd[f"{pb}.{task}.0.conv.weight"],
                sd[f"{pb}.{task}.0.conv.bias"])
            h = torch.nn.functional.batch_norm(
                h, sd[f"{pb}.{task}.0.bn.running_mean"],
                sd[f"{pb}.{task}.0.bn.running_var"],
                sd[f"{pb}.{task}.0.bn.weight"],
                sd[f"{pb}.{task}.0.bn.bias"], training=False, eps=1e-5)
            h = torch.relu(h)
            h = torch.nn.functional.conv1d(
                h, sd[f"{pb}.{task}.1.weight"], sd[f"{pb}.{task}.1.bias"])
            np.testing.assert_allclose(
                got[task], h.transpose(1, 2).numpy(), rtol=1e-4,
                atol=1e-5)
