"""BPE tokenizer training teeth (rows-only op, SURVEY §5.3 pattern:
pin the distributed implementation to an exact sequential replica)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from spark_glove_spark.functions.text import tokenize
from spark_glove_spark.operators.bpe import bpe_train, merge_pair_expr
from spark_glove_spark.sources import table

SF = "/root/testdata/sf0.001"


def bpe_replica(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python BPE with the identical greedy fold + tiebreak."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(n_merges):
        cnt: Counter = Counter()
        for w, f in word_freqs.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                cnt[(a, b)] += f
        if not cnt:
            break
        (left, right), c = sorted(
            cnt.items(), key=lambda kv: (-kv[1], kv[0])
        )[0]
        merged = left + right
        merges.append((rank, left, right, merged, c))
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_bpe_matches_replica_on_fixture(spark):
    words = (
        table(spark, SF, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wf = {r.word: r.freq for r in words.collect()}
    expect = bpe_replica(wf, 10)
    got = bpe_train(words, n_merges=10)
    assert got == expect


def test_bpe_planted_corpus_and_merge_semantics(spark):
    # "abab" x3 + "aaa": top pair is (a,b) weight 6; greedy fold on
    # "aaa" under (a,a) must yield [aa, a], not overlap
    words = spark.createDataFrame(
        [("abab", 3), ("aaa", 1)], "word string, freq long"
    )
    merges = bpe_train(words, n_merges=2)
    assert merges[0][1:4] == ("a", "b", "ab")
    # after merging ab: abab -> [ab, ab] so (ab, ab) has weight 3;
    # aaa is untouched -> (a,a) weight 2 -> second merge is (ab, ab)
    assert merges[1][1:4] == ("ab", "ab", "abab")

    df = spark.createDataFrame([(["a", "a", "a"],)], "sym array<string>")
    out = df.select(merge_pair_expr(F.col("sym"), "a", "a", "aa").alias("m"))
    assert out.collect()[0].m == ["aa", "a"]


def test_bpe_deterministic_across_runs(spark):
    words = (
        table(spark, SF, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    assert bpe_train(words, 5) == bpe_train(words, 5)


def test_bpe_segmentation_matches_replica(spark):
    words = (
        table(spark, SF, "documents")
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    wf = {r.word: r.freq for r in words.collect()}
    # replica: re-derive final segmentations after 10 merges
    syms = {w: list(w) for w in wf}
    for _, left, right, merged, _c in bpe_replica(wf, 10):
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = merged
                else:
                    out.append(x)
            syms[w] = out
    from spark_glove_spark import api

    got = {
        r.word: (r.segments.split(","), r.n_segments)
        for r in api.REGISTRY["h17_bpe_segment"].fn(spark, SF).collect()
    }
    assert set(got) == set(wf)
    for w, (segs, n) in got.items():
        assert segs == syms[w] and n == len(syms[w]), (w, segs, syms[w])
