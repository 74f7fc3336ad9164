"""ms_deform_attn_sample vs the reference's pytorch fallback oracle
(`fusion_encoder.py:ms_deform_attn_core_pytorch` math, reimplemented here
with torch.grid_sample as golden)."""
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from isfusion_tpu.ops.deform_attn import ms_deform_attn_sample  # noqa: E402


def torch_oracle(value_maps, loc, weights):
    """value_maps: list of (H, W, nh, hd) np; loc (Lq, nh, nl, np, 2) in
    [0,1]; weights (Lq, nh, nl, np). Mirrors the mmcv pytorch fallback."""
    lq, nh, nl, npts, _ = loc.shape
    out = 0
    for lvl, vm in enumerate(value_maps):
        h, w, _, hd = vm.shape
        # (nh, hd, H, W)
        v = torch.from_numpy(vm).permute(2, 3, 0, 1)
        g = torch.from_numpy(2 * loc[:, :, lvl] - 1)  # (Lq, nh, np, 2)
        g = g.permute(1, 0, 2, 3)                     # (nh, Lq, np, 2)
        samp = torch.nn.functional.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros",
            align_corners=False)                      # (nh, hd, Lq, np)
        wts = torch.from_numpy(weights[:, :, lvl]).permute(1, 0, 2)
        out = out + (samp * wts[:, None]).sum(-1).permute(2, 0, 1)
    return out.reshape(lq, nh * hd).numpy()


def test_matches_torch_oracle():
    rng = np.random.default_rng(0)
    lq, nh, npts, hd = 5, 2, 3, 4
    maps = [rng.normal(size=(7, 9, nh, hd)).astype(np.float32),
            rng.normal(size=(4, 5, nh, hd)).astype(np.float32)]
    loc = rng.uniform(-0.1, 1.1, size=(lq, nh, 2, npts, 2)).astype(
        np.float32)
    w = rng.uniform(size=(lq, nh, 2, npts)).astype(np.float32)
    w /= w.reshape(lq, nh, -1).sum(-1)[..., None, None]

    ours = np.asarray(ms_deform_attn_sample(
        [jnp.asarray(m) for m in maps], jnp.asarray(loc), jnp.asarray(w)))
    ref = torch_oracle(maps, loc, w)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
