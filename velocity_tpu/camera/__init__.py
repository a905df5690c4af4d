"""Camera models and data-boundary ingest: intrinsics database, annotations, EXIF."""

from velocity_tpu.camera.database import CameraInfo, camera_info  # noqa: F401
from velocity_tpu.camera.annotations import load_annotation, Annotation  # noqa: F401
from velocity_tpu.camera.exif import read_exif, exif_to_llat  # noqa: F401
