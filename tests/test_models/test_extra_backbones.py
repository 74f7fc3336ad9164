"""NoStemRegNet / MultiBackbone / YOLOXPAFPN forward tests
(`mmdet3d/models/backbones/nostem_regnet.py`, `multi_backbone.py`,
`necks/yolox_pafpn.py`)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isfusion_tpu.models.backbones.regnet import (NoStemRegNet, RegNet,
                                                  generate_regnet)


def test_generate_regnet_docstring_arch():
    # the reference docstring arch (nostem_regnet.py:43-58) yields stage
    # widths 96/192/432/1008
    widths, depths = generate_regnet(88, 26.31, 2.25, 25)
    from isfusion_tpu.models.backbones.regnet import adjust_width_group
    widths, groups = adjust_width_group(widths, 1.0, 48)
    assert widths == [96, 192, 432, 1008]
    assert sum(depths) == 25


def test_nostem_regnet_forward_shapes():
    m = NoStemRegNet(arch=dict(w0=24, wa=24.48, wm=2.54, group_w=8,
                               depth=8, bot_mul=1.0),
                     base_channels=16, out_indices=(0, 1, 2))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 16, 16, 16)), jnp.float32)
    outs, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert len(outs) >= 2
    # each stage halves spatial dims
    for i in range(1, len(outs)):
        assert outs[i].shape[1] == outs[i - 1].shape[1] // 2
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_regnet_with_stem():
    m = RegNet(arch=dict(w0=24, wa=24.48, wm=2.54, group_w=8, depth=4,
                         bot_mul=1.0), stem_channels=8,
               out_indices=(0, 1))
    x = jnp.zeros((1, 32, 32, 3))
    outs, _ = m.init_with_output(jax.random.PRNGKey(0), x)
    assert outs[0].shape[1] == 8  # stem stride 2 + stage stride 2


def test_multi_backbone_aggregation():
    from isfusion_tpu.models.backbones.multi_backbone import MultiBackbone
    sa_cfg = dict(
        type="PointNet2SASSG", in_channels=4,
        num_points=(32, 16), radius=(0.4, 0.8), num_samples=(8, 8),
        sa_channels=((8, 8), (8, 16)), fp_channels=((16, 16),))
    m = MultiBackbone(num_streams=2, backbones=sa_cfg,
                      suffixes=("net0", "net1"))
    rng = np.random.default_rng(1)
    pts = jnp.asarray(rng.normal(size=(1, 64, 4)), jnp.float32)
    mask = jnp.ones((1, 64), bool)
    out, _ = m.init_with_output(jax.random.PRNGKey(0), pts, mask)
    assert "hd_feature" in out
    assert "fp_features_net0" in out and "fp_features_net1" in out
    # aggregation output: concat 16+16 -> default mlp ends at 32/2 = 16
    assert out["hd_feature"].shape[-1] == 16
    assert np.isfinite(np.asarray(out["hd_feature"])).all()


@pytest.mark.slow
def test_yolox_pafpn_shapes():
    from isfusion_tpu.models.necks.yolox_pafpn import YOLOXPAFPN
    m = YOLOXPAFPN(in_channels=[8, 16, 32], out_channels=8,
                   num_csp_blocks=1)
    rng = np.random.default_rng(2)
    ins = [jnp.asarray(rng.normal(size=(1, s, s, c)), jnp.float32)
           for s, c in [(16, 8), (8, 16), (4, 32)]]
    outs, _ = m.init_with_output(jax.random.PRNGKey(0), ins)
    assert [o.shape for o in outs] == [(1, 16, 16, 8), (1, 8, 8, 8),
                                      (1, 4, 4, 8)]
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
