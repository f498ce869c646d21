"""Iterated BPE training fixpoint (round-7 verdict #2).

``d74`` computes ONE merge-candidate round (the pair-frequency
statistic); this module iterates it into an actual trainer: a bounded
multi-round loop that, per round, (1) counts adjacent symbol pairs,
(2) picks the most frequent pair deterministically, (3) re-segments
every word by merging that pair greedily left-to-right, and records
the merge table — the artifact a tokenizer ships.

Scale shape (how a 100 TB corpus trains a real BPE vocab):

- **The corpus collapses first.** Training runs on the WORD-TYPE
  histogram (word, count), never the token stream: one map-side-
  partial shuffle bounded by vocabulary size, after which every round
  touches a vocab-sized table — millions of rows at web scale, not
  trillions.
- **No data-sized driver state.** The winning pair is a 1-row
  DataFrame broadcast into the re-segmentation (a broadcast 1-row
  cross join, the repo's scalar-join convention) — the driver never
  collects anything.
- **Bounded lineage.** Each round's segmentation is
  ``localCheckpoint``-ed (the d40/pagerank discipline), so R rounds
  cost R short jobs, not a 4^R plan.

Greedy merge without a sequential scan: adjacent occurrences of the
winning pair (l, r) can only overlap when ``l == r`` (a run of the
same symbol), and greedy left-to-right pairing within a run of length
k merges exactly the even offsets 0, 2, 4, … — so the merge is three
window passes (run grouping, offset parity, consumed-by-previous),
all per-word partitions, no UDF and no order-dependent fold.

Reference scope: beyond-reference LLM-data-curation surface (the
reference has no tokenizer); d74's one-round statistic is at
``plans/wave6.py:353``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def word_types(docs: DataFrame) -> DataFrame:
    """(word, w): the word-type histogram of the corpus — the only
    corpus-sized pass of the whole training loop."""
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("w"))
    )


def initial_segmentation(wt: DataFrame) -> DataFrame:
    """(word, w, pos, sym): every word split into 1-char symbols,
    positions 1-based — row-local sequence+transform, no Python."""
    return wt.select(
        "word",
        "w",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("word")),
                lambda i: F.col("word").substr(i, F.lit(1)),
            )
        ).alias("p0", "sym"),
    ).select(
        "word", "w", (F.col("p0") + 1).cast("long").alias("pos"), "sym"
    )


def bpe_round(seg: DataFrame, rnd: int) -> tuple[DataFrame, DataFrame]:
    """One training round over a segmentation table.

    Returns ``(merge_row, new_seg)``: the 1-row merge table entry
    (round, left_sym, right_sym, pair_count, merged) and the
    re-segmented table. Pair counting weights by word-type count and
    counts every adjacent position (overlapping, the classic
    ``get_stats``); only the merge APPLICATION is non-overlapping
    greedy. Ties break deterministically by (n DESC, left, right)."""
    wo = Window.partitionBy("word").orderBy("pos")
    adj = seg.withColumn("nsym", F.lead("sym").over(wo))
    best = (
        adj.filter(F.col("nsym").isNotNull())
        .groupBy(F.col("sym").alias("lsym"), F.col("nsym").alias("rsym"))
        .agg(F.sum("w").alias("n"))
        .orderBy(F.col("n").desc(), "lsym", "rsym")
        .limit(1)
        .localCheckpoint()
    )
    j = (
        adj.crossJoin(F.broadcast(best))
        .withColumn("is_l", F.col("sym") == F.col("lsym"))
    )
    # gaps-and-islands: constant per maximal run of the left symbol
    wg = Window.partitionBy("word", "is_l").orderBy("pos")
    j = j.withColumn(
        "grp", F.when(F.col("is_l"), F.col("pos") - F.row_number().over(wg))
    )
    wr = Window.partitionBy("word", "grp").orderBy("pos")
    j = j.withColumn(
        "adjm",
        F.col("is_l")
        & F.coalesce(F.col("nsym") == F.col("rsym"), F.lit(False)),
    ).withColumn(
        "ms",
        F.col("adjm")
        & (
            (F.col("lsym") != F.col("rsym"))
            | (F.pmod(F.row_number().over(wr) - 1, F.lit(2)) == 0)
        ),
    )
    j = j.withColumn(
        "consumed", F.coalesce(F.lag("ms").over(wo), F.lit(False))
    )
    new_seg = (
        j.filter(~F.col("consumed"))
        .select(
            "word",
            "w",
            F.row_number().over(wo).cast("long").alias("pos"),
            F.when(F.col("ms"), F.concat("sym", "rsym"))
            .otherwise(F.col("sym"))
            .alias("sym"),
        )
    )
    merge_row = best.select(
        F.lit(rnd).cast("long").alias("round"),
        F.col("lsym").alias("left_sym"),
        F.col("rsym").alias("right_sym"),
        F.col("n").alias("pair_count"),
        F.concat("lsym", "rsym").alias("merged"),
    )
    return merge_row, new_seg


def encode_stats(docs: DataFrame, rounds: int) -> DataFrame:
    """Apply the trainer's merges back to the corpus and measure the
    compression curve: per round 0..rounds, the total corpus token
    count (Σ word-type count × symbols-per-word), tokens-per-word,
    and the ratio vs the character baseline — the table that tells a
    tokenizer build when extra merges stop paying. Same bounded
    machinery as ``bpe_train``; the per-round totals are 1-row
    aggregates of the vocab-sized segmentation."""
    wt = word_types(docs).localCheckpoint()
    n_words = F.broadcast(wt.agg(F.sum("w").alias("n_words")))
    seg = initial_segmentation(wt).localCheckpoint()

    def stat(seg_df: DataFrame, rnd: int) -> DataFrame:
        return seg_df.agg(F.sum("w").alias("corpus_tokens")).select(
            F.lit(rnd).cast("long").alias("round"), "corpus_tokens"
        )

    rt = stat(seg, 0)
    for rnd in range(1, rounds + 1):
        _, seg = bpe_round(seg, rnd)
        seg = seg.localCheckpoint()
        rt = rt.unionByName(stat(seg, rnd))
    t0 = F.broadcast(
        rt.filter(F.col("round") == 0).select(
            F.col("corpus_tokens").alias("tok0")
        )
    )
    return (
        rt.crossJoin(n_words)
        .crossJoin(t0)
        .select(
            "round",
            "corpus_tokens",
            F.round(
                F.col("corpus_tokens").cast("double") / F.col("n_words"), 6
            ).alias("tokens_per_word"),
            F.round(
                F.col("corpus_tokens").cast("double") / F.col("tok0"), 6
            ).alias("compression"),
        )
        .orderBy("round")
    )


def bpe_train(docs: DataFrame, rounds: int) -> DataFrame:
    """Train ``rounds`` merges; returns the merge table ordered by
    round. Each round's segmentation is localCheckpoint-ed so lineage
    stays one round deep."""
    seg = initial_segmentation(word_types(docs)).localCheckpoint()
    merge_rows = []
    for rnd in range(1, rounds + 1):
        merge_row, seg = bpe_round(seg, rnd)
        seg = seg.localCheckpoint()
        merge_rows.append(merge_row)
    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out.orderBy("round")
