from . import blob_ingest, windows  # noqa: F401
