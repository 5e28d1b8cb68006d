"""Structure-from-motion layer — BASELINE.json config 4.

Replaces the reference's hard-coded camera poses
(``/root/reference/src/CameraStereoVision.cpp:33-39``) with measured ones:
Harris features + patch descriptors (``features.py``), mutual-ratio matching
(``matching.py``), midpoint triangulation (``triangulate.py``), Schur-
complement bundle adjustment with matrix-free CG (``ba.py``), and pose-graph
refinement (``pose_graph.py``). Everything is fixed-shape, vmap-first JAX:
feature counts are padded to static maxima with validity masks, so the whole
calibration pipeline jits and shards (observation sharding + psum — the
distributed-BA path of config 5, ``parallel/ba.py``).
"""

from stereovisionarray_tpu.sfm.features import (  # noqa: F401
    Features,
    detect_features,
    describe_patches,
    extract_features,
)
from stereovisionarray_tpu.sfm.matching import Matches, match_descriptors  # noqa: F401
from stereovisionarray_tpu.sfm.triangulate import (  # noqa: F401
    reprojection_errors,
    triangulate_midpoint,
)
from stereovisionarray_tpu.sfm.ba import (  # noqa: F401
    BAProblem,
    BAState,
    bundle_adjust,
)
from stereovisionarray_tpu.sfm.refine import lk_refine  # noqa: F401
from stereovisionarray_tpu.sfm.pose_graph import (  # noqa: F401
    PoseGraph,
    pose_graph_optimize,
)
