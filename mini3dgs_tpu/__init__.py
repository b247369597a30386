"""mini3dgs_tpu: a TPU-native differentiable 3D Gaussian Splatting framework.

Brand-new JAX/XLA/Pallas implementation with the capability surface of
`Loveof1ife7/mini-3d-gaussian-splatting` (see SURVEY.md), redesigned TPU-first:
functional pytrees, static-shape slot pools, fused Pallas raster kernels with a
hand-written VJP, and shard_map-based tile/data parallelism.
"""

__version__ = "0.1.0"

from .config import ConfigManager, TrainingConfig
from .core.camera import Camera
from .core.gaussians import Gaussians, create_from_pcd, create_from_random
from .ops.renderer import RenderSettings, render
