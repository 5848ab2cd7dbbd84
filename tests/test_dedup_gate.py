"""q24 block-size gate (VERDICT r04 #3): jaccard_pairs must probe block
cardinality and cut over from metadata blocking to the MinHash-LSH band
blocking (the q23 rung) when the largest block exceeds the bound —
otherwise a hot metadata key degenerates quadratically at scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from binwatch_spark.operators import dedup

DOCS = [
    # one hot block ("web") with two near-dup pairs + noise
    (1, "web", "the quick brown fox jumps over the lazy dog again and again"),
    (2, "web", "the quick brown fox jumps over the lazy dog again and again!"),
    (3, "web", "completely different text about spark shuffles and partitions"),
    (4, "web", "completely different text about spark shuffles and partitions ok"),
    (5, "web", "unrelated noise document mentioning neither foxes nor shuffles"),
    (6, "books", "a lonely block with a single document pairs with nothing"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "source", "text"])


def _pairs(df):
    return sorted((r["i"], r["j"]) for r in df.select("i", "j").collect())


def test_below_gate_exact_metadata_blocking(docs):
    out = dedup.jaccard_pairs(docs, "text", "doc_id", "source", 0.8)
    assert _pairs(out) == [(1, 2), (3, 4)]


def test_above_gate_cuts_over_to_lsh_banding(docs):
    gated = dedup.jaccard_pairs(
        docs, "text", "doc_id", "source", 0.8, max_block_docs=3
    )
    lsh = dedup.minhash_lsh_pairs(docs, "text", "doc_id", 0.8)
    assert _pairs(gated) == _pairs(lsh)
    # the LSH rung still finds the true near-dup pairs here (high-sim pairs
    # collide in ≥1 band with near-certainty at these thresholds)
    assert set(_pairs(gated)) >= {(1, 2), (3, 4)}


def test_cutover_plan_is_band_blocked(docs):
    # Pin the cutover in the PLAN: the gated form must join on LSH band
    # keys (Generate/posexplode over band columns), not on the metadata
    # blocking column.
    import contextlib
    import io

    gated = dedup.jaccard_pairs(
        docs, "text", "doc_id", "source", 0.8, max_block_docs=3
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        gated.explain("formatted")
    plan = buf.getvalue()
    # the candidate join keys are (band_idx, band_key), not the metadata col
    assert "band_key" in plan
    assert "Left keys [2]: [band_idx" in plan
