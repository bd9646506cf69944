from .server import BatchingSampler  # noqa: F401
