from .entropy import patch_entropy  # noqa: F401
from .vq import VectorQuantizeEMA  # noqa: F401
