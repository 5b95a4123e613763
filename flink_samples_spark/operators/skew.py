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
    re-deal rows to different salt groups mid-aggregation — pass
    ``pin_lineage=True`` to the public helpers to localCheckpoint
    first (see :func:`_salt_input`), or better, pass ``id_cols``."""
    if "__salt" in df.columns:
        raise ValueError(
            "input already has a column named '__salt', which the skew "
            "helpers would overwrite and drop — rename it first"
        )
    if id_cols:
        missing = [c for c in id_cols if c not in df.columns]
        if missing:
            raise ValueError(f"_row_salt: id_cols not in input: {missing}")
        # pmod is already non-negative for negative hashes; an abs()
        # wrapper would ANSI-overflow on a hash of exactly -2^63
        return F.pmod(F.xxhash64(*id_cols), F.lit(n_salts))
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))


def _salt_input(
    df: DataFrame, id_cols: Sequence[str] | None, pin_lineage: bool
) -> DataFrame:
    """Lineage handling for the nondeterministic-salt path (no
    id_cols): ``pin_lineage=True`` eagerly localCheckpoints so
    monotonically_increasing_id is reproducible across stage retries
    — required when the input is itself post-shuffle (join/agg
    output). Deliberately NOT the default: checkpointing a deterministic
    file scan pays a full materialization for zero retry benefit and
    makes the job unrecoverable on executor loss (checkpointed blocks
    have no lineage to recompute from). No-op when id_cols are given
    — the content salt needs no lineage pinning at all."""
    return df.localCheckpoint(eager=True) if (pin_lineage and not id_cols) else df


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    n_salts: int = 16,
    id_cols: Sequence[str] | None = None,
    pin_lineage: bool = False,
) -> DataFrame:
    """Two-phase salted aggregation: sums/counts per key, skew-proof.

    Output columns: ``keys…, sum_<col>…, n_rows`` (if count).
    ``id_cols``: a (near-)unique row identity making the salt
    deterministic under stage retries — see :func:`_row_salt`; pass it
    whenever one exists. Without it the salt is only retry-safe when
    the input's lineage is deterministic (a file scan); for
    post-shuffle input set ``pin_lineage=True`` to localCheckpoint
    first (costs a materialization — see :func:`_salt_input`).
    """
    if not sum_cols and not count:
        raise ValueError(
            "salted_agg: nothing to aggregate — pass sum_cols and/or count=True"
        )
    df = _salt_input(df, id_cols, pin_lineage)
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
    pin_lineage: bool = False,
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
    retry-deterministic salt; ``pin_lineage``: localCheckpoint a
    post-shuffle big side when no id exists — see :func:`_row_salt` /
    :func:`_salt_input`.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_broadcast_replicate_join supports how='inner'/'left', got {how!r}: "
            "the replicated small side would duplicate unmatched rows under outer modes"
        )
    big = _salt_input(big, id_cols, pin_lineage)
    big_s = big.withColumn("__salt", _row_salt(big, n_salts, id_cols))
    small_s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")
