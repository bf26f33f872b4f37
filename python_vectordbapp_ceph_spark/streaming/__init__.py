from . import ingest, windows  # noqa: F401
