from stereovisionarray_tpu.datasets.synthetic import (  # noqa: F401
    SceneSpec,
    render_camera_array,
    render_view,
    reference_rig,
)
from stereovisionarray_tpu.datasets.middlebury import (  # noqa: F401
    MiddleburyPair,
    load_middlebury_pair,
    read_pfm,
    write_pfm,
    parse_calib,
)
from stereovisionarray_tpu.datasets.io import (  # noqa: F401
    list_images_sorted,
    load_image_gray,
    load_image_stack,
    save_array,
    load_array,
    save_png,
    save_ply,
    load_ply,
)
