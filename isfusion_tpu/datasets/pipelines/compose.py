"""Pipeline composition (mmcv Compose surface, epoch-aware)."""
from __future__ import annotations

from typing import List, Optional

from ...registry import PIPELINES, build_from_cfg


class Compose:
    def __init__(self, transforms: List):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(build_from_cfg(dict(t), PIPELINES))
            else:
                self.transforms.append(t)

    def set_epoch(self, epoch: int) -> None:
        """Propagate the epoch to epoch-scheduled transforms
        (`datasets/custom_3d.py:set_epoch:73`)."""
        for t in self.transforms:
            if hasattr(t, "set_epoch"):
                t.set_epoch(epoch)

    def __call__(self, data: Optional[dict]) -> Optional[dict]:
        for t in self.transforms:
            data = t(data)
            if data is None:
                return None
        return data

    def __repr__(self) -> str:
        return "Compose(\n" + "\n".join(
            f"    {t}" for t in self.transforms) + "\n)"
