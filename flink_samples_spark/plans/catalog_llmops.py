"""Tier-X catalog: LLM-data-pipeline operators (SURVEY.md §2.11)."""

from __future__ import annotations

# Populated in the next build step.
