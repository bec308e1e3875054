from . import embedder  # noqa: F401
from .encoder import SpatialEncoder  # noqa: F401
from .heads import NeRFHeads, ViewFusion, dparf_representation  # noqa: F401
from .network import TransHumanNet  # noqa: F401
from .vit import TransHE  # noqa: F401
