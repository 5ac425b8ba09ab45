"""Custom exception types (reference: utils/errors.py)."""

from __future__ import annotations


class HUBModelError(Exception):
    """Model fetch error (reference errors.py ``HUBModelError``)."""

    def __init__(self, message: str = "Model not found locally; downloads are unavailable offline."):
        super().__init__(message)
