"""Skew-mitigation operators (100 TB design, SURVEY.md §2/§4 notes).

AQE's skew-join splitting handles most runtime skew; these helpers
cover the cases AQE can't re-plan:

- :func:`salted_agg`: a hot grouping key overwhelms one reducer.
  Phase 1 aggregates on (key, salt) — salt from a per-row id, so the
  hot key fans out over ``n_salts`` reducers EVEN when its rows are
  byte-identical; phase 2 merges the partials per key. Works for
  algebraic aggregates (sum/count/min/max — anything with a merge
  function); avg is expressed as sum+count and divided after the
  merge.
- :func:`salted_broadcast_replicate_join`: big×small equi-join where
  one big-side key is hot AND the small side is too large to
  broadcast whole but fine to replicate ``n_salts`` times per
  partition of the key range: big side gets a per-row salt, small
  side is exploded once per salt value, join on (key, salt). The
  hot key's rows then spread over n reducers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Per-ROW salt: monotonically_increasing_id mod n.

    NOT a content hash: a hash of the columns is constant across
    duplicate rows, so a hot key whose rows repeat (the classic skew
    case — coarse timestamps, categorical payloads, or a key-only
    projection) would land entirely in ONE salt bucket and the
    mitigation would silently do nothing. The id is partition-local
    sequential — rows of any one key spread across salts regardless
    of content. Salt values are not stable across runs, but no
    caller's RESULT depends on them (they only shape the shuffle);
    the equality tests against unsalted plans pin that."""
    if "__salt" in df.columns:
        raise ValueError(
            "input already has a column named '__salt', which the skew "
            "helpers would overwrite and drop — rename it first"
        )
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


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
    if not sum_cols and not count:
        raise ValueError(
            "salted_agg: nothing to aggregate — pass sum_cols and/or count=True"
        )
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
