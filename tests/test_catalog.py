"""Differential tests: every registered query vs its DuckDB oracle.

One parametrized test per declared query id — the local mirror of the
driver's t2 gate.
"""

from __future__ import annotations

import pytest

from flink_samples_spark.plans import QUERIES
from tests._harness import run_check


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle(spark, sf_dir, name):
    run_check(spark, sf_dir, name)
