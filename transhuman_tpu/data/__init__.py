"""Host-side input pipeline: ZJU-MoCap datasets, ray/patch sampling, loader."""

from .catalog import frame_sampler_indices, get_human_info  # noqa: F401
from .loader import Loader  # noqa: F401
