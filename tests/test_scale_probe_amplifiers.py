"""Pins for the scale probe's corpus amplifiers (scripts/scale_probe.py).

SCALE_PROBE.md's headline attribution — `minhash_lsh_disjoint`
measures the LSH PLAN's scaling while `minhash_lsh_pairs` measures a
duplicate-saturated corpus's quadratic pair OUTPUT — rests on two
properties of :func:`amplify_docs_disjoint` that are easy to break
silently (the first implementation did: interleaving marker tokens
BETWEEN words collapsed half of every doc's 3-gram shingles to
quasi-unigrams, inflating 255 true pairs to 3.5M candidates):

1. ISOMORPHISM: tagging words must not change the corpus's internal
   near-dup structure — one tagged copy yields exactly the plain
   corpus's pair set (same count, same doc_id pairs).
2. DISJOINTNESS: copies share no shingles, so k copies yield exactly
   k× the base pairs (every pair within one copy, none across).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_probe import amplify_docs_disjoint  # noqa: E402

from flink_samples_spark.llmops.dedup import minhash_lsh_pairs  # noqa: E402


def _pair_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_disjoint_amplifier_is_isomorphic_and_disjoint(spark, sf_dir):
    from flink_samples_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    plain = _pair_set(minhash_lsh_pairs(docs))
    spark.catalog.clearCache()
    assert plain, "fixture corpus must contain near-dup pairs"

    # 1 tagged copy == the plain corpus's exact pair set (copy 0's
    # doc_ids are unshifted, so the sets compare directly)
    one = _pair_set(minhash_lsh_pairs(amplify_docs_disjoint(docs, 1)))
    spark.catalog.clearCache()
    assert one == plain, "word-prefix tagging must preserve the pair structure"

    # 2 copies == each copy reproduces the base pairs under its own
    # id shift, and NO pair crosses copies (shingle-disjointness)
    two = _pair_set(minhash_lsh_pairs(amplify_docs_disjoint(docs, 2)))
    spark.catalog.clearCache()
    shift = 1_000_000_000
    expected = plain | {(a + shift, b + shift) for a, b in plain}
    assert two == expected, (
        "2-copy corpus must be exactly 2x the base pairs with zero "
        "cross-copy pairs"
    )
