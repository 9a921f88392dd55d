from . import tags, textual, vectors  # noqa: F401
