"""Nonlinear solvers: LM pose estimation, multi-view triangulation, bundle adjustment."""

from velocity_tpu.solvers.lm import lm_solve, LMResult  # noqa: F401
from velocity_tpu.solvers.pose import (  # noqa: F401
    solve_translation,
    solve_pose_rt,
    estimate_world_camera_pose,
)
from velocity_tpu.solvers.triangulate import (  # noqa: F401
    pairwise_intercept,
    nray_intercept,
    msv_refine_translation,
)
