"""Unigram-LM (SentencePiece-style) tokenizer trainer — EM over a
bounded candidate vocabulary (round-8 verdict #2: the other half of
the production tokenizer story next to ``bpe.py``'s merge trainer).

The algorithm (Kudo 2018, the public unigram-LM formulation):

1. **Seed vocab**: every substring of length 1..L of the (truncated)
   word types, scored by corpus frequency; keep all single characters
   (full coverage — every word always has ≥1 segmentation) plus the
   top-K multi-character candidates.
2. **E-step**: per word type, the forward/backward (sum-product)
   lattice over piece probabilities gives the POSTERIOR expected
   count of every candidate piece — true soft EM, which is what
   SentencePiece's trainer computes (Viterbi enters only as the
   serving-time argmax; its max-product twin lives in
   ``viterbi_stats``).
3. **M-step**: expected counts are 1e-6-quantized per lattice edge and
   summed as exact integers (the d140/d145 discipline — float sums
   are order-dependent, integer sums are not), then renormalized with
   add-one smoothing in micro-units so every piece keeps a strictly
   positive probability (no divide-by-zero lattice).

Determinism contract (what makes the DuckDB oracle and the python
replay test bit-exact): every float expression is written with a FIXED
association order — forward sums ascend over the predecessor index,
backward sums ascend over the successor index, posterior edges sum in
(j, i) order — and both engines evaluate the identical left-associated
tree; the only cross-row reductions are integer sums.

Scale shape (how a 100 TB corpus trains this):

- **The corpus collapses first** (the ``bpe.py`` rule): everything
  runs on the word-type histogram — one corpus-sized shuffle, then
  every EM round touches vocab-sized tables only.
- **Bounded lattice, no DP loop.** Words truncate to ``max_word_len``
  characters (SentencePiece caps sentence length the same way), so
  the forward/backward recurrences unroll into a CLOSED-FORM column
  expression chain over a pivoted (word × position-pair) wide row —
  no iteration, no UDF, one whole-stage-codegen projection.
- **Per round: one broadcast join + two vocab-sized shuffles.** The
  candidate-piece lattice table is materialized once
  (localCheckpoint); each round broadcast-joins the (≤ K + alphabet)-
  row vocab into it, pivots per word, and aggregates expected counts
  per piece. The vocab is always broadcast-sized by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Lattice bounds. Raised 8/4 → 12/6 in round 10 after the width study
# (BENCH_SCALING.md "Unigram lattice width"): the closed-form codegen
# chain at W=12/L=6 (57 lattice edges, 13-deep forward/backward
# unrolls) costs ~1.7× the W=8/L=4 wall on the Spark side and is
# negligible on the oracle side — an affordable step toward real
# SentencePiece fidelity (its trainer defaults to ~16-char sentence
# pieces). W=16/L=8 (100 edges) measured ~2.9×; the next raise should
# come with evidence that 12-char truncation is losing real mass.
MAX_WORD_LEN = 12  # W: training truncates word types to this length
MAX_PIECE_LEN = 6  # L: longest candidate piece
QUANT = 1_000_000  # micro-unit quantizer for expected counts


def lattice_pairs(
    w: int | None = None, l: int | None = None  # noqa: E741
) -> list[tuple[int, int]]:
    """All (j, i) span endpoints of the bounded lattice, in the FIXED
    (j asc, i asc) order every summation in this module uses. The
    bounds default to the module constants AT CALL TIME (not def
    time), so a width study can re-run the trainer under different
    W/L without rebinding every consumer — see BENCH_SCALING.md's
    lattice-width note."""
    w = MAX_WORD_LEN if w is None else w
    l = MAX_PIECE_LEN if l is None else l  # noqa: E741
    return [
        (j, i)
        for j in range(w)
        for i in range(j + 1, min(j + l, w) + 1)
    ]


def word_types_truncated(docs: DataFrame, w: int | None = None) -> DataFrame:
    """(word, w): word-type histogram with words truncated to ``w``
    chars (counts merge across truncation) — the only corpus-sized
    pass of the whole trainer. ``w`` defaults to ``MAX_WORD_LEN`` at
    call time (see ``lattice_pairs``)."""
    w = MAX_WORD_LEN if w is None else w
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .select(F.substring("tok", 1, w).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("w"))
    )


def word_types_full(docs: DataFrame) -> DataFrame:
    """(word, w): the UNTRUNCATED word-type histogram — the serving
    tier's corpus basis (round-10 verdict #4: at 100× words longer
    than ``MAX_WORD_LEN`` appear; honest token accounting must see the
    full words so the tail beyond the lattice can be counted as
    fallback/UNK instead of silently merged into truncated types).
    Same single corpus-sized pass as ``word_types_truncated``."""
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .select(F.col("tok").alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("w"))
    )


def candidate_pieces(wt: DataFrame) -> DataFrame:
    """(word, w, j, i, piece): every lattice edge of every word type —
    piece = word[j:i], 0 ≤ j < i ≤ len ≤ W, i-j ≤ L. Row-local
    sequence/transform explode, no Python. Built once per training
    run and localCheckpoint-ed by callers."""
    n = F.length("word")
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda j: F.transform(
                F.sequence(
                    j + 1, F.least(j + MAX_PIECE_LEN, n)
                ),
                lambda i: F.struct(j.alias("j"), i.alias("i")),
            ),
        )
    )
    ji = F.explode(spans).alias("ji")
    return wt.select("word", "w", ji).select(
        "word",
        "w",
        F.col("ji.j").cast("int").alias("j"),
        F.col("ji.i").cast("int").alias("i"),
        F.col("word").substr(
            F.col("ji.j") + 1, F.col("ji.i") - F.col("ji.j")
        ).alias("piece"),
    )


def seed_vocab(pieces: DataFrame, top_k: int) -> DataFrame:
    """(piece, qc): the bounded candidate vocabulary — every single
    character, plus the ``top_k`` multi-character substrings by exact
    corpus count (ties by piece string). qc is the integer count the
    first renormalization smooths (already exact — no quantization
    needed at seed time, word counts are integers).

    Global top-K via ``orderBy().limit()`` — Spark's
    TakeOrderedAndProject keeps K rows per partition and merges at
    the driver; a global row_number window would funnel the whole
    piece histogram through one partition (the q17 rule)."""
    hist = pieces.groupBy("piece").agg(F.sum("w").alias("qc"))
    singles = hist.filter(F.length("piece") == 1)
    multis = (
        hist.filter(F.length("piece") >= 2)
        .orderBy(F.col("qc").desc(), F.col("piece"))
        .limit(top_k)
    )
    return singles.unionByName(multis)


def prune_vocab(vocab_counts: DataFrame, keep_multi: int) -> DataFrame:
    """The SentencePiece prune step (by the standard expected-count
    approximation of the likelihood loss): keep every single character
    (coverage is inviolable) and the ``keep_multi`` highest-expected-
    count multi-character pieces (ties by piece string). Exact integer
    ordering — the counts are the M-step's quantized sums. Top-K via
    ``orderBy().limit()`` (TakeOrderedAndProject — see seed_vocab)."""
    singles = vocab_counts.filter(F.length("piece") == 1)
    multis = (
        vocab_counts.filter(F.length("piece") >= 2)
        .orderBy(F.col("qc").desc(), F.col("piece"))
        .limit(keep_multi)
    )
    return singles.unionByName(multis)


def normalized_probs(vocab_counts: DataFrame) -> DataFrame:
    """(piece, p): add-one-smoothed renormalization of integer counts
    — p = (qc + 1) / (Σqc + V), every input exact, one deterministic
    division. The 1-row total joins by broadcast cross join (the
    repo's scalar-join convention)."""
    tot = F.broadcast(
        vocab_counts.agg(
            F.sum("qc").alias("_t"), F.count("*").alias("_v")
        )
    )
    return vocab_counts.crossJoin(tot).select(
        "piece",
        (
            (F.col("qc") + 1).cast("double")
            / (F.col("_t") + F.col("_v")).cast("double")
        ).alias("p"),
    )


def _pivot_lattice(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """One wide row per word type: p_{j}_{i} = prob of the piece on
    lattice edge (j, i), 0.0 when the substring is not in the vocab.
    Broadcast join + one word-keyed pivot aggregate (max over a
    singleton — exact)."""
    joined = pieces.join(F.broadcast(probs), "piece")
    aggs = [
        F.coalesce(
            F.max(
                F.when((F.col("j") == j) & (F.col("i") == i), F.col("p"))
            ),
            F.lit(0.0),
        ).alias(f"p_{j}_{i}")
        for j, i in lattice_pairs()
    ]
    return joined.groupBy("word", "w").agg(*aggs)


def _with_forward_backward(wide: DataFrame) -> DataFrame:
    """Append f0..fW (forward sums), bW..b0 (backward sums) and z to
    the wide lattice row — the unrolled closed-form recurrences, each
    term chain left-associated in ascending index order (the
    determinism contract)."""
    w = MAX_WORD_LEN
    l = MAX_PIECE_LEN  # noqa: E741
    n = F.length("word")
    out = wide.withColumn("f0", F.lit(1.0))
    for i in range(1, w + 1):
        terms = [
            F.col(f"f{j}") * F.col(f"p_{j}_{i}")
            for j in range(max(0, i - l), i)
        ]
        expr = terms[0]
        for t in terms[1:]:
            expr = expr + t
        out = out.withColumn(f"f{i}", expr)
    out = out.withColumn(
        f"b{w}", F.when(n == w, F.lit(1.0)).otherwise(F.lit(0.0))
    )
    for i in range(w - 1, -1, -1):
        terms = [
            F.col(f"p_{i}_{k}") * F.col(f"b{k}")
            for k in range(i + 1, min(i + l, w) + 1)
        ]
        expr = terms[0]
        for t in terms[1:]:
            expr = expr + t
        sum_col = expr
        if i > 0:
            out = out.withColumn(
                f"b{i}", F.when(n == i, F.lit(1.0)).otherwise(sum_col)
            )
        else:
            out = out.withColumn("b0", sum_col)  # words are non-empty
    return out.withColumn("z", F.col("b0"))


def em_expected_counts(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """E-step + quantization: (piece, qc) — the 1e-6-quantized
    posterior expected count of every vocab piece, summed as exact
    integers across word types. Posterior of edge (j, i) is
    f_j · p_{j,i} · b_i / Z, weighted by the word-type count."""
    fb = _with_forward_backward(_pivot_lattice(pieces, probs))
    edges = []
    for j, i in lattice_pairs():
        c = (
            F.col(f"f{j}")
            * F.col(f"p_{j}_{i}")
            * F.col(f"b{i}")
            / F.col("z")
        )
        q = F.floor(
            F.col("w").cast("double") * c * QUANT + F.lit(0.5)
        ).cast("long")
        edges.append(
            F.struct(
                F.col("word").substr(F.lit(j + 1), F.lit(i - j)).alias("pc"),
                q.alias("q"),
            )
        )
    ex = fb.select(F.explode(F.array(*edges)).alias("e")).select(
        F.col("e.pc").alias("piece"), F.col("e.q").alias("q")
    )
    counts = (
        ex.filter(F.col("q") > 0).groupBy("piece").agg(F.sum("q").alias("qc"))
    )
    # keep V fixed: every vocab piece survives, zero-count included
    return (
        probs.select("piece")
        .join(counts, "piece", "left")
        .select("piece", F.coalesce(F.col("qc"), F.lit(0)).alias("qc"))
    )


def unigram_train(
    docs: DataFrame, rounds: int, top_k: int
) -> DataFrame:
    """Train ``rounds`` EM iterations over the seeded candidate vocab;
    returns (piece, qc, p) — the final expected micro-counts and
    smoothed probabilities, the artifact a unigram tokenizer ships.
    Each round's vocab is localCheckpoint-ed (bounded lineage, the
    bpe.py discipline) — a (K + alphabet)-row table, trivially cheap."""
    pieces = candidate_pieces(word_types_truncated(docs)).localCheckpoint()
    vocab = seed_vocab(pieces, top_k).localCheckpoint()
    for _ in range(rounds):
        vocab = em_expected_counts(
            pieces, normalized_probs(vocab)
        ).localCheckpoint()
    probs = normalized_probs(vocab)
    return vocab.join(probs, "piece").select("piece", "qc", "p")


def viterbi_encode(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """The serving-time encoder (round-9 verdict #4): per word type,
    the max-product Viterbi best segmentation's probability ``vbest``
    AND its piece count ``n_pieces`` — the number of tokens the
    tokenizer actually emits for the word. Returns (word, w, vbest,
    n_pieces).

    The count rides the same closed-form unrolled recurrence as the
    score: c_i = c_{argmax j}(v_j · p_{j,i}) + 1, with the argmax
    recovered by comparing v_i against each candidate term in FIXED
    ascending-j order (ties take the smallest j — the longest piece).
    Both engines compute v_i and every term from identical expression
    trees, so the float equality that picks the arm is bit-exact (the
    module's determinism contract); counts are exact integers."""
    w = MAX_WORD_LEN
    l = MAX_PIECE_LEN  # noqa: E741
    n = F.length("word")
    out = _pivot_lattice(pieces, probs).withColumn(
        "v0", F.lit(1.0)
    ).withColumn("c0", F.lit(0))
    for i in range(1, w + 1):
        js = list(range(max(0, i - l), i))
        terms = [F.col(f"v{j}") * F.col(f"p_{j}_{i}") for j in js]
        vi = F.greatest(*terms) if len(terms) > 1 else terms[0]
        out = out.withColumn(f"v{i}", vi)
        ci = None
        for j, t in zip(js, terms):
            cond = F.col(f"v{i}") == t
            arm = F.col(f"c{j}") + 1
            ci = F.when(cond, arm) if ci is None else ci.when(cond, arm)
        out = out.withColumn(f"c{i}", ci)
    vbest = F.col(f"v{w}")
    cbest = F.col(f"c{w}")
    for i in range(w - 1, 0, -1):
        vbest = F.when(n == i, F.col(f"v{i}")).otherwise(vbest)
        cbest = F.when(n == i, F.col(f"c{i}")).otherwise(cbest)
    return out.select(
        "word",
        "w",
        vbest.alias("vbest"),
        cbest.cast("long").alias("n_pieces"),
    )


def viterbi_stats(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """Serving-side lattice audit for one vocab: per word type, the
    max-product Viterbi score v (best single segmentation probability),
    the total probability Z, and the posterior expected piece count —
    all closed-form over the same wide lattice row. Returns one row
    per word type: (word, w, v, z, exp_pieces)."""
    w = MAX_WORD_LEN
    l = MAX_PIECE_LEN  # noqa: E741
    n = F.length("word")
    fb = _with_forward_backward(_pivot_lattice(pieces, probs))
    out = fb.withColumn("v0", F.lit(1.0))
    for i in range(1, w + 1):
        terms = [
            F.col(f"v{j}") * F.col(f"p_{j}_{i}")
            for j in range(max(0, i - l), i)
        ]
        out = out.withColumn(
            f"v{i}", F.greatest(*terms) if len(terms) > 1 else terms[0]
        )
    vbest = F.col(f"v{w}")
    for i in range(w - 1, 0, -1):
        vbest = F.when(n == i, F.col(f"v{i}")).otherwise(vbest)
    ec_terms = [
        F.col(f"f{j}") * F.col(f"p_{j}_{i}") * F.col(f"b{i}") / F.col("z")
        for j, i in lattice_pairs()
    ]
    ec = ec_terms[0]
    for t in ec_terms[1:]:
        ec = ec + t
    return out.select(
        "word",
        "w",
        vbest.alias("v"),
        F.col("z").alias("z"),
        ec.alias("exp_pieces"),
    )
