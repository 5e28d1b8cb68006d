"""Auxiliary subsystems (SURVEY.md §5): checkpoint/resume, profiling,
structured observability — everything the reference lacks (its only
persistence is one cv::Mat YAML write, ``/root/reference/src/functions.cpp:331-346``;
its only observability is imshow windows + mouse-click pixel prints,
``:220-239``)."""

from stereovisionarray_tpu.utils.checkpoint import (  # noqa: F401
    load_checkpoint,
    save_checkpoint,
)
from stereovisionarray_tpu.utils.profiling import (  # noqa: F401
    StageTimer,
    time_fn,
    trace,
)
from stereovisionarray_tpu.utils.obslog import MetricsLogger  # noqa: F401
from stereovisionarray_tpu.utils.elastic import (  # noqa: F401
    ElasticRunner,
    Heartbeat,
    reshard,
)
from stereovisionarray_tpu.utils.debug import (  # noqa: F401
    assert_deterministic,
    checked,
    find_nonfinite,
)
