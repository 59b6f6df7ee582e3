"""Pure-function geometry + projector ops (SURVEY.md L1/L2).

Everything here is stateless jax.numpy — safe under jit/vmap/shard_map/grad.
"""

from tpu_unsup_pc.ops.quaternion import (  # noqa: F401
    quat_normalize, quat_multiply, quat_rotate, quat_conjugate,
    quat_from_axis_angle, quat_to_rotation_matrix, quat_from_euler,
    quat_angle_between,
)
from tpu_unsup_pc.ops.camera import (  # noqa: F401
    camera_quat_from_azel, world_to_camera, camera_to_frustum,
    world_to_grid, Camera,
)
from tpu_unsup_pc.ops.splat import (  # noqa: F401
    splat_trilinear, splat_gauss_separable, pointcloud_to_voxels,
)
from tpu_unsup_pc.ops.gauss import gaussian_kernel1d, smoothen_voxels  # noqa: F401
from tpu_unsup_pc.ops.project import (  # noqa: F401
    collapse_to_silhouette, project_pointcloud, ProjectorOutput,
)
from tpu_unsup_pc.ops.chamfer import chamfer_l1, chamfer_l2  # noqa: F401
from tpu_unsup_pc.ops.resample import resample_voxels_to_frustum  # noqa: F401
