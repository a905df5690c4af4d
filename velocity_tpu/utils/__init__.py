"""Utilities: string helpers, profiling/observability."""

from velocity_tpu.utils.strings import filename_split, print_dict  # noqa: F401
from velocity_tpu.utils.profiling import StageTimer, trace  # noqa: F401
