"""Streaming-extension corpus — placeholder, populated in the streaming
phase (tumbling/sliding/session windows, batch-checkable)."""

from __future__ import annotations
