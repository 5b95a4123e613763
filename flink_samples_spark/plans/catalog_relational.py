"""Tier-C catalog: relational surface (SURVEY.md §2.2-2.7).

The reference ships a full SQL planner (flink-table-planner-loader,
pom.xml:135-140); these queries declare the equivalent Spark surface
over the driver's TPC-H-ish tables.
"""

from __future__ import annotations

# Populated in the next build step.
