"""Deduplication queries over ``documents`` (M4 extensions). Populated in M2/M4."""

from __future__ import annotations
