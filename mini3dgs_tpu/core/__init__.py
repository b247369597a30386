from .camera import Camera, build_projection_matrix_v1, build_projection_matrix_v2, build_world_view_matrix
from .gaussians import Gaussians, create_from_pcd, create_from_random, reset_opacity, scene_extent_of
from .loss import dssim, gaussian_loss, ssim
from .transforms import build_covariance_3d, inverse_sigmoid, quat_to_rotmat
