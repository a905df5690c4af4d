"""End-to-end pipelines: per-frame tracking state, the 3-stage KLT tracker,
and the speed-estimation driver."""

from velocity_tpu.pipeline.tracker import ThreeStageTracker, TrackOutput  # noqa: F401
from velocity_tpu.pipeline.speedest import SpeedEstimator, RunResult  # noqa: F401
