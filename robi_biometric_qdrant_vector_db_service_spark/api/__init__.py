"""S8: HTTP serving facade over the engine (reference src/api/)."""

from .service import VectorService  # noqa: F401
