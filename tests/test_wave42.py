"""Wave 42 — iterated BPE trainer (d162).

The verdict's 'Done' bar: a pure-python Counter replay of classic BPE
training (get_stats + greedy merge_word) must reproduce the Spark
merge table exactly — over the real sf0.001 corpus AND over a crafted
corpus whose winning pairs have left == right with runs of length ≥ 3
(the only shape where greedy non-overlap is non-trivial)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import bpe


def _python_bpe(word_counts: dict[str, int], rounds: int):
    """Classic reference trainer: overlapping pair counts, greedy
    left-to-right merge application."""
    segs = {w: list(w) for w in word_counts}
    merges = []
    for rnd in range(1, rounds + 1):
        stats: Counter = Counter()
        for w, syms in segs.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += word_counts[w]
        if not stats:
            break
        (l, r), n = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, l, r, n, l + r))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == l
                    and syms[i + 1] == r
                ):
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges


def _spark_merges(docs):
    return [
        (r.round, r.left_sym, r.right_sym, r.pair_count, r.merged)
        for r in bpe.bpe_train(docs, 8).collect()
    ]


def _word_counts(docs):
    rows = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .count()
        .collect()
    )
    return {r.w: r["count"] for r in rows}


def test_bpe_matches_python_replay_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    expect = _python_bpe(_word_counts(docs), 8)
    assert _spark_merges(docs) == expect


def test_bpe_greedy_run_parity(spark):
    """Runs of the winning symbol (left == right, length ≥ 3) pair at
    even offsets only — 'aaaa' → [aa, aa], 'aaaaa' → [aa, aa, a] —
    and later rounds see the re-segmented stream."""
    texts = [
        "aaaa aaaa aaaaa",
        "aaa baa aab",
        "aaaa aa a",
        "bbbb aaab",
    ]
    docs = spark.createDataFrame([(t,) for t in texts], "text string")
    expect = _python_bpe(_word_counts(docs), 8)
    got = _spark_merges(docs)
    assert got == expect
    # sanity: the crafted corpus really does pick an l == r winner
    assert any(m[1] == m[2] for m in expect)


def test_bpe_encode_stats_match_python_replay(spark):
    """d167's per-round corpus token totals equal the python trainer's
    re-segmented lengths, and the curve is monotone non-increasing."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    wc = _word_counts(docs)

    # python replay that also tracks per-round totals
    segs = {w: list(w) for w in wc}
    totals = [sum(len(s) * wc[w] for w, s in segs.items())]
    for rnd, (_, l, r, _, _) in enumerate(_python_bpe(wc, 8), start=1):
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
        totals.append(sum(len(s) * wc[w] for w, s in segs.items()))

    rows = bpe.encode_stats(docs, 8).collect()
    got = [r.corpus_tokens for r in rows]
    assert got == totals
    assert got == sorted(got, reverse=True)
    assert rows[0].compression == 1.0


def test_bpe_round_resegmentation_shapes(spark):
    """One round over 'aaa' (count 1): winner (a,a) with overlapping
    count 2; segmentation becomes [aa, a] (array form — round-11
    rework: the merge is a row-local fold, not a window pass)."""
    docs = spark.createDataFrame([("aaa",)], "text string")
    seg = bpe.initial_segmentation(bpe.word_types(docs))
    merge_row, new_seg = bpe.bpe_round(seg, 1)
    m = merge_row.collect()[0]
    assert (m.left_sym, m.right_sym, m.pair_count, m.merged) == (
        "a",
        "a",
        2,
        "aa",
    )
    out = new_seg.collect()
    assert len(out) == 1
    assert out[0].syms == ["aa", "a"]
