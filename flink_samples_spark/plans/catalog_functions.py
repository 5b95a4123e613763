"""Tier-C catalog: scalar function families + UDF surface (SURVEY.md §2.8, §2.10)."""

from __future__ import annotations

# Populated in the next build step.
