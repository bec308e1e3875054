"""Output visualizers: free-viewpoint frames, mesh export, video assembly."""

from .perform import PerformVisualizer  # noqa: F401
from .video import frames_to_video  # noqa: F401
