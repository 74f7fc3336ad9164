"""isfusion_tpu: a TPU-native (JAX/XLA/Pallas) multimodal 3D detection framework.

Re-implements the capability surface of IS-Fusion / mmdetection3d-v0.16
(reference: yinjunbo/IS-Fusion) as an idiomatic JAX framework:

- Device compute path: pure-functional jittable ops (``isfusion_tpu.ops``) and
  flax.linen models (``isfusion_tpu.models``) with static shapes throughout.
- Host path: numpy box/point structures, data pipeline, nuScenes evaluation.
- Parallelism: ``jax.sharding.Mesh`` + shard_map data parallelism
  (``isfusion_tpu.parallel``), replacing the reference's NCCL DDP.
"""

__version__ = "0.1.0"

from .registry import Registry, build_from_cfg  # noqa: F401
from .config import Config  # noqa: F401
