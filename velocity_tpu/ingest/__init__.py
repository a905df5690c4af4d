"""Host-side media ingest: video decode (with prefetch), stills, frame dumping."""

from velocity_tpu.ingest.video import VideoReader, open_video  # noqa: F401
from velocity_tpu.ingest.stills import load_still, StillsReader  # noqa: F401
