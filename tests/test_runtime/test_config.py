"""Config-zoo regression net: every config must resolve and its model must
build (pattern of reference tests/test_runtime/test_config.py:20,74)."""
import glob
import os

import pytest

from isfusion_tpu.config import Config
from isfusion_tpu.models import build_detector

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
CONFIGS = [p for p in glob.glob(os.path.join(REPO, "configs", "**", "*.py"),
                                recursive=True)
           if "_base_" not in p]


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: os.path.basename(p))
def test_config_builds_model(path):
    cfg = Config.fromfile(path)
    assert "model" in cfg
    model = build_detector(cfg.model)
    assert model is not None
    # mmcv-style surface keys every runnable config must provide
    assert cfg.model.get("type")


def test_base_inheritance_and_override():
    path = os.path.join(
        REPO, "configs", "pointpillars",
        "hv_pointpillars_secfpn_sbn-all_4x8_2x_nus-3d.py")
    cfg = Config.fromfile(path)
    # _delete_ replaced FPN with SECONDFPN
    assert cfg.model["pts_neck"]["type"] == "SECONDFPN"
    assert cfg.model["pts_voxel_layer"]["max_num_points"] == 64
