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


def _row_salt(df: DataFrame, n_salts: int, id_cols: Sequence[str] | None) -> Column:
    """Per-ROW salt assigning a key's rows across ``n_salts`` buckets.

    With ``id_cols`` (STRONGLY preferred): ``xxhash64(id_cols) mod n``
    — fully deterministic, so a partial map-stage retry after a fetch
    failure reassigns every row to the SAME (key, salt) group it had
    in the first attempt; no reducer can double-count or miss rows.
    Pass a unique (or near-unique) row identity — a primary key, or
    the least-duplicated column tuple available: duplicate id tuples
    merely share a salt bucket (weaker spread), never break results.

    Without ``id_cols``: ``monotonically_increasing_id() mod n``,
    which spreads even byte-identical duplicate rows (a content hash
    would pile a hot key's repeated rows into ONE bucket and the
    mitigation would silently do nothing) — but the id is only
    reproducible across stage retries when the input's lineage is
    deterministic (a file scan, or a checkpointed frame). If the
    input is itself post-shuffle (join/agg output), a retry can
    re-deal rows to different salt groups mid-aggregation, so this
    path ``localCheckpoint``s the input first to pin partition
    contents — correct, but it materializes the frame; at terabyte
    scale pass ``id_cols`` instead."""
    if "__salt" in df.columns:
        raise ValueError(
            "input already has a column named '__salt', which the skew "
            "helpers would overwrite and drop — rename it first"
        )
    if id_cols:
        missing = [c for c in id_cols if c not in df.columns]
        if missing:
            raise ValueError(f"_row_salt: id_cols not in input: {missing}")
        return F.pmod(F.abs(F.xxhash64(*id_cols)), F.lit(n_salts))
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def _salt_input(df: DataFrame, id_cols: Sequence[str] | None) -> DataFrame:
    """Pin lineage for the nondeterministic-salt path (no id_cols):
    eager localCheckpoint makes monotonically_increasing_id
    reproducible across stage retries. No-op when id_cols are given."""
    return df if id_cols else df.localCheckpoint(eager=True)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    n_salts: int = 16,
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation: sums/counts per key, skew-proof.

    Output columns: ``keys…, sum_<col>…, n_rows`` (if count).
    ``id_cols``: a (near-)unique row identity making the salt
    deterministic under stage retries — see :func:`_row_salt`; without
    it the input is localCheckpointed first, which costs a
    materialization.
    """
    if not sum_cols and not count:
        raise ValueError(
            "salted_agg: nothing to aggregate — pass sum_cols and/or count=True"
        )
    df = _salt_input(df, id_cols)
    salted = df.withColumn("__salt", _row_salt(df, n_salts, id_cols))
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
    id_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Equi-join with the small side replicated once per salt bucket.

    The big side never shuffles by ``key`` alone (hot keys spread over
    ``n_salts`` reducers); the small side grows ×n_salts, which is the
    explicit price of the skew insurance.

    Only ``inner`` and ``left`` are valid: each big row carries exactly
    one salt, so big-side semantics are preserved — but the replicated
    small side would emit one unmatched row PER SALT under
    ``right``/``full``.

    ``id_cols``: (near-)unique big-side row identity for a
    retry-deterministic salt — see :func:`_row_salt`.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_broadcast_replicate_join supports how='inner'/'left', got {how!r}: "
            "the replicated small side would duplicate unmatched rows under outer modes"
        )
    big = _salt_input(big, id_cols)
    big_s = big.withColumn("__salt", _row_salt(big, n_salts, id_cols))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
