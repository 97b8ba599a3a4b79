"""User-facing API — placeholder, filled in by the api milestone."""

from __future__ import annotations


class Quandary:  # pragma: no cover - replaced by the full implementation
    pass
