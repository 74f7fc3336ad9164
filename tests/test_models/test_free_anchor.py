"""FreeAnchor3DHead: bag-matching loss finite + gradients flow."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_pointpillars import tiny_pointpillars_cfg, tiny_batch  # noqa: E402

from isfusion_tpu.models import build_detector  # noqa: E402


@pytest.mark.slow
def test_free_anchor_loss_and_grads():
    cfg = tiny_pointpillars_cfg()
    cfg["pts_bbox_head"]["type"] = "FreeAnchor3DHead"
    cfg["pts_bbox_head"]["pre_anchor_topk"] = 8
    model = build_detector(cfg)
    batch = tiny_batch()
    v = model.init(jax.random.PRNGKey(0), batch, train=False, mode="feats")
    losses, _ = model.apply(v, batch, train=True, mode="loss",
                            mutable=["batch_stats"])
    assert {"positive_bag_loss", "negative_bag_loss"} <= set(losses)
    assert all(np.isfinite(float(x)) for x in losses.values())
    assert float(losses["positive_bag_loss"]) > 0

    def loss_fn(p):
        out, _ = model.apply({**v, "params": p}, batch, train=True,
                             mode="loss", mutable=["batch_stats"])
        return sum(jnp.asarray(x) for x in out.values())

    g = jax.grad(loss_fn)(v["params"])
    tot = sum(float(jnp.sum(jnp.abs(x)))
              for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(tot) and tot > 0
    # inference path still the Anchor3DHead decode
    out = model.apply(v, batch, train=False, mode="predict")
    assert np.isfinite(np.asarray(out["bboxes"])).all()
