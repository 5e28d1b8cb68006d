from stereovisionarray_tpu.ops.census import (  # noqa: F401
    census_transform,
    hamming_distance,
)
from stereovisionarray_tpu.ops.cost_volume import (  # noqa: F401
    birchfield_tomasi_volume,
    census_cost_volume,
    fused_cost_volume,
    right_from_left_volume,
)
from stereovisionarray_tpu.ops.sgm import (  # noqa: F401
    sgm_aggregate,
    sgm_aggregate_reference,
)
from stereovisionarray_tpu.ops.confidence import (  # noqa: F401
    confidence_from_volume,
    pkrn_confidence,
    second_best_cost,
)
from stereovisionarray_tpu.ops.wta import (  # noqa: F401
    disparity_from_volume,
    left_right_check,
    subpixel_refine,
    winner_take_all,
)
from stereovisionarray_tpu.ops.warp import (  # noqa: F401
    bilinear_sample,
    homography_warp,
    warp_with_disparity,
    splat_depth,
)
from stereovisionarray_tpu.ops.refine import (  # noqa: F401
    RefineOutput,
    box_filter2d,
    multiview_refine,
)
from stereovisionarray_tpu.ops.postfilter import (  # noqa: F401
    median3x3,
    speckle_filter,
)
