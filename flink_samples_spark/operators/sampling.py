"""Sampling operators for training-data pipelines (SURVEY.md §2.11
tier X — no reference site; a 100 TB corpus is curated by sampling).

Three tiers:

- :func:`hash_sample` — DETERMINISTIC Bernoulli sampling by key hash
  (Knuth multiplicative). The same key always makes the same
  in/out decision, independent of partitioning, executor count, or
  row order — the property that makes a sample reproducible across
  reruns and joinable against itself (sample the docs table and the
  embeddings table with the same key → consistent pairing). Pure
  int64 arithmetic, so it is expressible in ANSI SQL and
  oracle-checkable (unlike ``rand(seed)``, whose stream is
  partition-dependent and engine-specific).
- :func:`stratified_sample` — per-stratum fractions via the same
  deterministic hash (per-stratum thresholds) for class rebalancing.
- :func:`reservoir_per_group` — exact k rows per group for bounded
  per-class caps: deterministic rank over the same multiplicative
  hash, one shuffle, per-partition top-k heaps (no full sort).

Scale notes: all three are single-pass, shuffle-free except
``reservoir_per_group`` (one shuffle on the group key). None of them
collect to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_samples_spark.operators.analytic import topk_per_group

# Knuth's multiplicative constant (2^32 / phi). Odd, hence coprime
# with 2^31: key*K mod 2^31 is a bijection on [0, 2^31), so the
# scrambled value is uniform when keys are distinct. The 31-bit
# domain (not 32) keeps the product under 2^63 — ANSI-mode Spark and
# DuckDB both reject int64 overflow.
_KNUTH = 2654435761
# xxHash's PRIME32_2 — the second multiplier of the xor-shift
# finalizer below (any odd 32-bit constant works; this one is public
# and well-studied)
_MIX = 2246822519


def _hash_unit(key: Column, salt: int) -> Column:
    """Deterministic uniform-ish value in [0, 1) from an integer key.
    int64 arithmetic only (each product stays under 2^63), identical
    in any ANSI SQL engine (the DuckDB oracle twins replay the same
    five steps with xor()/>>).

    The xor-shift finalizer after the first multiply is what makes
    different salts give INDEPENDENT samples: a multiply alone is
    linear in the salt, so u(key, s) would be u(key, 0) plus a
    constant rotation — every pair of module operators with
    different default salts would be deterministically coupled
    (e.g. a weighted sample drawn entirely from the 'train' split).
    The xor of shifted high bits breaks that linearity.
    """
    x = F.pmod(key.cast("bigint") + F.lit(salt), F.lit(1 << 31))
    x = F.pmod(x * F.lit(_KNUTH), F.lit(1 << 31))
    x = x.bitwiseXOR(F.shiftright(x, 15))
    x = F.pmod(x * F.lit(_MIX), F.lit(1 << 31))
    x = x.bitwiseXOR(F.shiftright(x, 13))
    return x / F.lit(float(1 << 31))


def _int_key(df: DataFrame, key: str) -> Column:
    """Validate that ``key`` is an integral id column — the hash's
    bijection/uniformity story is int64 arithmetic. A string id would
    otherwise cast to NULL per row (non-ANSI: silently empty sample)
    or throw CAST_INVALID_INPUT mid-job (ANSI)."""
    from pyspark.sql import types as T

    dt = df.schema[key].dataType
    if not isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"sampling key column {key!r} must be an integral id, got "
            f"{dt.simpleString()}; hash non-integer ids to int64 first "
            "(e.g. df.withColumn('k', F.xxhash64(...)))"
        )
    return F.col(key)


def hash_sample(df: DataFrame, key: str, fraction: float, salt: int = 0) -> DataFrame:
    """Keep rows whose hashed ``key`` lands under ``fraction``.
    Reproducible: membership depends only on (key, salt, fraction);
    different ``salt`` values give independent samples."""
    return df.filter(_hash_unit(_int_key(df, key), salt) < fraction)


def stratified_sample(
    df: DataFrame,
    stratum: str,
    fractions: dict,
    key: str = "doc_id",
    salt: int = 7,
    seed: int | None = None,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (class rebalancing): keep
    ``fractions[v]`` of rows with ``stratum == v`` (strata absent
    from the dict are dropped, matching ``sampleBy`` semantics).

    Selection is the same deterministic multiplicative hash as
    :func:`hash_sample` (on ``key``, stratum-independent ``salt``),
    NOT ``sampleBy``: sampleBy's rand stream depends on partition
    layout, so its output changes under repartitioning — useless for
    a reproducible corpus and impossible to oracle-check. The hash
    form is a pure function of (key, salt, fractions) and plain
    int64 SQL. ``seed`` is accepted as a legacy alias for ``salt``.
    """
    if seed is not None:
        salt = seed
    frac = F.lit(None).cast("double")
    for v, f in fractions.items():
        frac = F.when(F.col(stratum) == v, F.lit(float(f))).otherwise(frac)
    return df.filter(_hash_unit(_int_key(df, key), salt) < frac)


def hash_split(
    df: DataFrame,
    key: str,
    weights: Sequence[tuple[str, float]] = (
        ("train", 0.90),
        ("val", 0.05),
        ("test", 0.05),
    ),
    salt: int = 13,
) -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in the
    split whose cumulative-weight interval contains its hashed ``key``.

    The assignment is a pure function of (key, salt, weights) — stable
    under repartitioning, re-runs, and engine changes — which is the
    contract a 100 TB corpus needs so that the same document never
    migrates between train and eval across pipeline versions (silent
    contamination). Weights are normalized; evaluation order follows
    the given sequence, so float-boundary rows assign identically in
    any ANSI engine evaluating the same cumulative thresholds.

    Output: input columns + ``split``. Narrow map, no shuffle.
    """
    if not weights:
        raise ValueError("hash_split: weights must be non-empty")
    if any(w < 0 for _, w in weights):
        raise ValueError(f"hash_split: negative weight in {list(weights)!r}")
    total = sum(w for _, w in weights)
    if total <= 0:
        raise ValueError("hash_split: weights sum to zero")
    u = _hash_unit(_int_key(df, key), salt)
    expr = F.lit(weights[-1][0])
    cum = 0.0
    thresholds = []
    for name, w in weights[:-1]:
        cum += w / total
        thresholds.append((name, cum))
    for name, t in reversed(thresholds):
        expr = F.when(u < F.lit(t), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def reservoir_per_group(
    df: DataFrame, group_by: Sequence[str], key: str, k: int, salt: int = 0
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen uniformly by
    deterministic hash rank — the distributed form of per-class
    reservoir sampling (caps any one class of a skewed corpus).

    ``key`` must be unique within each group for the selection to be
    fully deterministic: rows sharing a ``key`` value tie on the whole
    (hash, key) ordering, and which of them ranks inside the top-k then
    depends on partition/sort order. With a unique key (the usual
    document-id case) the output is a pure function of (key, salt, k).
    """
    if "rn" in df.columns:
        raise ValueError(
            "reservoir_per_group: input already has a column named 'rn', "
            "which the internal rank would silently overwrite and drop — "
            "rename it first"
        )
    out = topk_per_group(
        df,
        list(group_by),
        [_hash_unit(_int_key(df, key), salt), F.col(key)],
        k,
    )
    return out.drop("rn")


def weighted_sample(
    df: DataFrame,
    weight_col: str | Column,
    key_col: str = "doc_id",
    salt: int = 29,
) -> DataFrame:
    """Deterministic weighted Bernoulli sampling: keep a row iff its
    hash-uniform u(key) < weight — per-row inclusion probability
    equals the (0..1-clamped) weight, reproducible across runs,
    partitionings, and engines (no RNG state; the same
    multiplicative-hash uniform as hash_sample/hash_split, so any
    ANSI engine replays the identical decision).

    The curation primitive behind quality-weighted corpus downsampling
    ("keep high-quality docs with probability ∝ quality"): a pure
    narrow filter, zero shuffles, composable with any upstream score.
    """
    w = weight_col if isinstance(weight_col, Column) else F.col(weight_col)
    u = _hash_unit(_int_key(df, key_col), salt)
    return df.filter(u < F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0)))
