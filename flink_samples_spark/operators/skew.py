"""Skew-mitigation operators (100 TB design, SURVEY.md §2/§4 notes).

AQE's skew-join splitting handles most runtime skew; these helpers
cover the cases AQE can't re-plan:

- :func:`salted_agg`: a hot grouping key overwhelms one reducer.
  Phase 1 aggregates on (key, salt) — salt derived deterministically
  from a row hash, so the hot key fans out over ``n_salts`` reducers;
  phase 2 merges the partials per key. Works for algebraic aggregates
  (sum/count/min/max — anything with a merge function); avg is
  expressed as sum+count and divided after the merge.
- :func:`salted_broadcast_replicate_join`: big×small equi-join where
  one big-side key is hot AND the small side is too large to
  broadcast whole but fine to replicate ``n_salts`` times per
  partition of the key range: big side gets salt = hash(row) % n,
  small side is exploded once per salt value, join on (key, salt).
  The hot key's rows then spread over n reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: xxhash64 over all columns mod n —
    stable across runs/partitionings (no rand())."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: sums/counts per key, skew-proof.

    Output columns: ``keys…, sum_<col>…, n_rows`` (if count).
    """
    salted = df.withColumn("__salt", _row_salt(df, n_salts))
    partial_aggs = [F.sum(c).alias(f"sum_{c}") for c in sum_cols]
    if count:
        partial_aggs.append(F.count(F.lit(1)).alias("n_rows"))
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    final_aggs = [F.sum(f"sum_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        final_aggs.append(F.sum("n_rows").alias("n_rows"))
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_broadcast_replicate_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the small side replicated once per salt bucket.

    The big side never shuffles by ``key`` alone (hot keys spread over
    ``n_salts`` reducers); the small side grows ×n_salts, which is the
    explicit price of the skew insurance.

    Only ``inner`` and ``left`` are valid: each big row carries exactly
    one salt, so big-side semantics are preserved — but the replicated
    small side would emit one unmatched row PER SALT under
    ``right``/``full``.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_broadcast_replicate_join supports how='inner'/'left', got {how!r}: "
            "the replicated small side would duplicate unmatched rows under outer modes"
        )
    big_s = big.withColumn("__salt", _row_salt(big, n_salts))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
