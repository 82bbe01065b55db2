from .muglm import (
    perspective, ortho, frustum, translate, scale, rotate, mat4_cast,
    quat_from_axis_angle, quat_mul, quat_rotate, quat_slerp, quat_normalize,
    look_at_quat, look_at_matrix, normalize, INFINITE_FAR_PLANE,
)
from .aabb import AABB
from .frustum import Frustum, frustum_cull
from .transforms import compose_trs, decompose_trs
