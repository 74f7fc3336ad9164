from .builder import build_dataset, build_dataloader, DataLoader  # noqa: F401
from .custom_3d import Custom3DDataset  # noqa: F401
from .nuscenes_dataset import NuScenesDataset  # noqa: F401
from .kitti_dataset import KittiDataset  # noqa: F401
from .lyft_waymo import (LyftDataset, SemanticKITTIDataset,  # noqa: F401
                         WaymoDataset)
from .indoor_datasets import (  # noqa: F401
    ScanNetDataset, SUNRGBDDataset, S3DISDataset)
from .nuscenes_mono_dataset import NuScenesMonoDataset  # noqa: F401
from .dataset_wrappers import CBGSDataset, SimpleDataset  # noqa: F401
from . import pipelines  # noqa: F401
