from stereovisionarray_tpu.models.two_view import (  # noqa: F401
    TwoViewOutput,
    disparity_to_depth,
    depth_to_disparity,
    two_view_disparity,
)
from stereovisionarray_tpu.models.plane_sweep import (  # noqa: F401
    PlaneSweepOutput,
    plane_sweep_depth,
    plane_sweep_volume,
)
from stereovisionarray_tpu.models.calibration import (  # noqa: F401
    CalibrationResult,
    build_tracks,
    calibrate_array,
)
from stereovisionarray_tpu.models.array_pipeline import (  # noqa: F401
    ArrayPipelineOutput,
    array_baselines,
    array_depth_pipeline,
)
from stereovisionarray_tpu.models.fusion import (  # noqa: F401
    FusionResult,
    depth_normals,
    fuse_depth_maps,
    fused_point_cloud,
    reconstruct_array,
)
from stereovisionarray_tpu.models.serving import (  # noqa: F401
    FrameResult,
    TemporalFrameResult,
    TemporalParams,
    frame_sets_from_dirs,
    stream_depth_maps,
    stream_depth_maps_chunked,
    stream_temporal,
)
from stereovisionarray_tpu.models.temporal import (  # noqa: F401
    TemporalOutput,
    TemporalState,
    temporal_filter_sequence,
    temporal_init,
    temporal_update,
)
from stereovisionarray_tpu.models.cascade import (  # noqa: F401
    CascadeOutput,
    cascade_two_view_disparity,
)
from stereovisionarray_tpu.models.cascade_sweep import (  # noqa: F401
    cascade_plane_sweep_depth,
    cascade_static_params,
)
