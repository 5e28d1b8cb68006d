from stereovisionarray_tpu.models.two_view import (  # noqa: F401
    TwoViewOutput,
    disparity_to_depth,
    depth_to_disparity,
    two_view_disparity,
)
