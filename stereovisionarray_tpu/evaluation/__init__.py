from stereovisionarray_tpu.evaluation.metrics import (  # noqa: F401
    absolute_trajectory_error,
    bad_pixel_ratio,
    depth_error_map,
    end_point_error,
    masked_mean_error,
)
