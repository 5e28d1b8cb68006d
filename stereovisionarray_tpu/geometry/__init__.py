from stereovisionarray_tpu.geometry.camera import (  # noqa: F401
    CameraArray,
    make_camera_array,
    translation_only_array,
    look_at_rotation,
)
from stereovisionarray_tpu.geometry.lie import (  # noqa: F401
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
)
from stereovisionarray_tpu.geometry.topology import (  # noqa: F401
    PairTopology,
    camera_pairs,
    pair_groups,
)
from stereovisionarray_tpu.geometry.epipolar import (  # noqa: F401
    epipolar_candidates,
    rectified_shift_candidates,
)
from stereovisionarray_tpu.geometry.pointcloud import (  # noqa: F401
    depth_map_to_points,
    points_to_depth_map,
    point_cloud_colors,
)
from stereovisionarray_tpu.geometry.rectify import (  # noqa: F401
    RectifiedPair,
    rectified_disparity_to_depth,
    rectify_images,
    rectify_pair,
)
from stereovisionarray_tpu.geometry.cloudops import (  # noqa: F401
    remove_outliers,
    voxel_downsample,
)
from stereovisionarray_tpu.geometry.distortion import (  # noqa: F401
    Distortion,
    distort_image,
    distort_points,
    undistort_image,
    undistort_points,
)
