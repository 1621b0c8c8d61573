"""Multimodal-column queries (binary payloads + typed metadata). Populated in M6."""

from __future__ import annotations
