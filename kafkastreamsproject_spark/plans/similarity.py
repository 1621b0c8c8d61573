"""Similarity-search queries over ``embeddings`` (M4 extensions). Populated in M3."""

from __future__ import annotations
