"""Planted-corpus test for the K-round BPE merge loop: a corpus built
so the top merges are known a priori must learn them in order."""

from __future__ import annotations

from apache_iceberg_exploration_spark.operators.evolution import (
    bpe_merges_from_docs,
)


def test_planted_merges_emerge_in_order(spark):
    # 'th' dominates (the/then/that), then 'e'+<nothing>... design:
    # freq(t,h) = 60, freq(he after th-merge) lower, 'qu' = 40, etc.
    docs = spark.createDataFrame(
        [("the the the the thin",),] * 10 + [("queen quiz quay",)] * 8,
        "text string",
    )
    out = bpe_merges_from_docs(spark, docs, k=3).collect()
    by_step = {r["step"]: r for r in out}
    # round 1: (t,h) appears in every word of the first block's types
    # {the, thin} with freqs 40+10 = 50; (q,u) = 3 types x 8 = 24
    assert (by_step[1]["left_sym"], by_step[1]["right_sym"]) == ("t", "h")
    assert by_step[1]["weight"] == 50
    # round 2: after the th-merge, (th,e) = 40 beats (q,u) = 24
    assert by_step[2]["merged"] == "the"
    assert by_step[2]["weight"] == 40
    # round 3: (q,u) = 24
    assert (by_step[3]["left_sym"], by_step[3]["right_sym"]) == ("q", "u")
    assert by_step[3]["weight"] == 24


def test_greedy_nonoverlapping_merge(spark):
    # 'aaaa' as one word type: pair (a,a) counted 3 times (adjacent
    # positions) but the merge is greedy non-overlapping -> 'aa','aa'
    docs = spark.createDataFrame([("aaaa bb",)] * 5, "text string")
    out = bpe_merges_from_docs(spark, docs, k=2).collect()
    assert out[0]["merged"] == "aa" and out[0]["weight"] == 15
    # round 2 over re-segmented {aa aa, bb}: (aa,aa)=5, (b,b)=5 ->
    # tie-break on pair string: 'aa<SEP>aa' < 'b<SEP>b'
    assert out[1]["merged"] == "aaaa" and out[1]["weight"] == 5
