"""Text-analysis queries over ``documents`` (M4 extensions). Populated in M2."""

from __future__ import annotations
