"""H3DNet (VoteNet + geometric-primitive votes) smoke test."""
import numpy as np
import pytest

from isfusion_tpu.models import build_detector

import sys
import os
sys.path.insert(0, os.path.dirname(__file__))
from test_indoor_variants import (backbone_cfg, votehead_cfg,  # noqa: E402
                                  tiny_batch, run_all_modes)


@pytest.mark.slow
def test_h3dnet():
    cfg = dict(type="H3DNet", backbone=backbone_cfg(),
               bbox_head=votehead_cfg(), primitive_channels=32,
               test_cfg=dict(max_output_num=8))
    losses, out = run_all_modes(build_detector(cfg), tiny_batch())
    assert "loss_face_vote" in losses and "loss_edge_vote" in losses
    assert out["bboxes"].shape == (2, 8, 7)
    assert np.isfinite(np.asarray(out["bboxes"])).all()
