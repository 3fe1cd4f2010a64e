"""Training-data pipeline corpus — placeholder, populated in the
pipeline phase (dedup / similarity / text analysis / multimodal)."""

from __future__ import annotations
