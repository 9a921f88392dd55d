from . import dedup, graph  # noqa: F401
