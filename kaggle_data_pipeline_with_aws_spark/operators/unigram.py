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

Scale shape (how a 100 TB corpus trains this), REWORKED in the
round-11 optimization pass (guide §2.4 "remove shuffles outright",
§1.2 "the distributed algorithm first"):

- **The corpus collapses first** (the ``bpe.py`` rule): everything
  runs on the word-type histogram — one corpus-sized shuffle, then
  every EM round touches word-type-sized tables only.
- **Bounded lattice, no DP loop.** Words truncate to ``max_word_len``
  characters (SentencePiece caps sentence length the same way), so
  the forward/backward recurrences unroll into a CLOSED-FORM column
  expression chain over a (word × position-pair) wide row — no
  iteration, no UDF, one whole-stage-codegen projection.
- **Per round: ZERO joins, ONE piece-keyed integer-sum shuffle.**
  The vocabulary is bounded by construction (top_k + alphabet rows —
  a few hundred), so each round's smoothed probabilities ship into
  the lattice as a LITERAL map (``try_element_at`` over a constant
  ``create_map``) instead of a broadcast join + word-keyed pivot
  shuffle. The round's only distributed work is the E-step projection
  over the checkpointed histogram and the M-step's partial-aggregated
  integer sum; the vocab-sized result is collected to the driver
  (the same provably-bounded fence class as the repo's 1-row scalar
  collects) to parameterize the next round's literals. Before this
  rework every round paid a broadcast build + a word-keyed pivot
  exchange of the 57-edges-per-word lattice table; see
  OPTIMIZATION_r11.md for the measured delta.
- **Identical values.** The map literal carries the SAME doubles the
  broadcast-join path produced: p = (qc+1)/(Σqc+V) is one IEEE-754
  division of exact integers whether evaluated by Spark, DuckDB, or
  the driver (all < 2^53), and every downstream float expression is
  unchanged. The python replay test and the DuckDB oracles pin this.
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


def truncate_types(wt_full: DataFrame, w: int | None = None) -> DataFrame:
    """(word, w): the truncated histogram DERIVED from the full one —
    a word-type-sized re-aggregation instead of a second corpus pass
    (round-11 optimization: d210 needed both histograms and paid the
    corpus explode + shuffle twice; counts merge across truncation
    identically either way)."""
    w = MAX_WORD_LEN if w is None else w
    return (
        wt_full.select(
            F.substring("word", 1, w).alias("word"), F.col("w")
        )
        .groupBy("word")
        .agg(F.sum("w").alias("w"))
    )


def candidate_pieces(wt: DataFrame) -> DataFrame:
    """(word, w, j, i, piece): every lattice edge of every word type —
    piece = word[j:i], 0 ≤ j < i ≤ len ≤ W, i-j ≤ L. Row-local
    sequence/transform explode, no Python. Feeds the one-shot seed
    histogram; the EM rounds no longer touch it (the lattice is
    re-derived per round from the histogram + a literal prob map)."""
    spans = (
        "flatten(transform(sequence(0, length(word) - 1), "
        f"j -> transform(sequence(j + 1, least(j + {MAX_PIECE_LEN}, "
        "length(word))), i -> named_struct('j', j, 'i', i))))"
    )
    return wt.selectExpr("word", "w", f"explode({spans}) AS ji").selectExpr(
        "word",
        "w",
        "CAST(ji.j AS INT) AS j",
        "CAST(ji.i AS INT) AS i",
        "substring(word, ji.j + 1, ji.i - ji.j) AS piece",
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


# ---------------------------------------------------------------------------
# Driver-side vocab bookkeeping (round-11 optimization). The vocab is
# bounded by construction (top_k multi-char pieces + the alphabet), so
# holding it as a list of (piece, qc) int rows on the driver is the
# same provably-tiny fence class as the repo's 1-row scalar collects —
# NOT data-sized driver state. Every float it derives is one IEEE-754
# division of exact integers (< 2^53), identical in Spark, DuckDB and
# CPython, so shipping the probabilities back into the plan as
# literals preserves the module's bit-exactness contract.
# ---------------------------------------------------------------------------
def collect_vocab(vocab_counts: DataFrame) -> list[tuple[str, int]]:
    """Collect a (piece, qc) vocab DataFrame to driver rows, sorted by
    piece (a canonical order; values are order-free)."""
    return sorted(
        (r["piece"], r["qc"]) for r in vocab_counts.collect()
    )


def probs_map(vocab_rows: list[tuple[str, int]]) -> dict[str, float]:
    """piece → (qc+1)/(Σqc+V): the SAME double ``normalized_probs``
    computes (one exact-integer IEEE division)."""
    t = sum(qc for _, qc in vocab_rows)
    v = len(vocab_rows)
    return {piece: (qc + 1) / (t + v) for piece, qc in vocab_rows}


def prune_rows(
    vocab_rows: list[tuple[str, int]], keep_multi: int
) -> list[tuple[str, int]]:
    """Driver-side twin of ``prune_vocab`` over collected rows: all
    singles + top ``keep_multi`` multis by (qc desc, piece asc) —
    exact integer ordering; python str comparison is codepoint order,
    which equals the engines' binary UTF-8 collation."""
    singles = [(p, c) for p, c in vocab_rows if len(p) == 1]
    multis = sorted(
        ((p, c) for p, c in vocab_rows if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:keep_multi]
    return sorted(singles + multis)


def vocab_df(spark, vocab_rows: list[tuple[str, int]]) -> DataFrame:
    """(piece, qc) DataFrame from driver rows (computed THIS run from
    the corpus — a plan-construction convenience, not a cache)."""
    return spark.createDataFrame(vocab_rows, "piece string, qc long")


def vocab_with_probs_df(spark, vocab_rows: list[tuple[str, int]]) -> DataFrame:
    """(piece, qc, p): the trained artifact — probabilities computed
    by the SAME Spark expression ``normalized_probs`` uses, with the
    integer total/size as literals instead of a broadcast 1-row
    cross join."""
    t = sum(qc for _, qc in vocab_rows)
    v = len(vocab_rows)
    return vocab_df(spark, vocab_rows).select(
        "piece",
        "qc",
        (
            (F.col("qc") + 1).cast("double")
            / (F.lit(t) + F.lit(v)).cast("double")
        ).alias("p"),
    )


def _prob_maps_params(spark, pmap: dict[str, float]) -> DataFrame:
    """The probability maps as a ONE-ROW parameter DataFrame — one
    map<string,double> column ``__m{L}`` per piece length (vocab-
    bounded rows, a LocalRelation: broadcasting it launches no job).

    Round-12 optimization (guide §4 boundary discipline / round-11
    verdict #4): the round-11 form inlined the maps as SQL literals,
    which re-embedded the per-length map into EVERY lattice edge of
    that length — MB-scale task binaries ("Broadcasting large task
    binary" WARNs in the round-11 driver bench) and, worse, a fresh
    whole-stage-codegen SOURCE per EM round (the literals differ every
    round), so every round re-paid janino compilation of the full
    unrolled lattice chain. With the probabilities riding a broadcast
    parameter row instead, the generated SQL text — and therefore the
    codegen source and its compiled class — is IDENTICAL across
    rounds, queries, and reps; only the broadcast data changes. Values
    are bit-identical: the same piece→double lookups evaluate through
    ``try_element_at`` either way (per-length map because an edge
    (j, i) can only hold a piece of length i-j — each lookup scans
    only the keys of that exact length)."""
    by_len: dict[int, dict[str, float]] = {}
    for piece, p in pmap.items():
        by_len.setdefault(len(piece), {})[piece] = p
    schema = ", ".join(
        f"__m{ln} map<string,double>" for ln in range(1, MAX_PIECE_LEN + 1)
    )
    row = tuple(by_len.get(ln, {}) for ln in range(1, MAX_PIECE_LEN + 1))
    return spark.createDataFrame([row], schema)


def _edge_prob_sql(word_sql: str, j: int, i: int) -> str:
    """p_{j}_{i} as SQL: the vocab probability of word[j:i] when the
    edge exists (i ≤ len) and the piece is in the vocab, else 0.0.
    References the ``__m{L}`` parameter columns of
    ``_prob_maps_params`` — constant text, no embedded literals (an
    absent piece, or a length with no vocab pieces at all, reads an
    empty/missing map entry: NULL → coalesce 0.0, the same value the
    old literal form produced)."""
    return (
        f"CASE WHEN length({word_sql}) >= {i} THEN "
        f"coalesce(try_element_at(__m{i - j}, "
        f"substring({word_sql}, {j + 1}, {i - j})), CAST(0.0 AS DOUBLE)) "
        f"ELSE CAST(0.0 AS DOUBLE) END"
    )


def lattice_wide_from_map(wt: DataFrame, pmap: dict[str, float]) -> DataFrame:
    """One wide row per word type DIRECTLY from the histogram:
    p_{j}_{i} = pmap[word[j:i]] when the edge exists (i ≤ len) and the
    piece is in the vocab, else 0.0 — the exact cell values
    ``_pivot_lattice`` produced via broadcast join + pivot aggregate,
    with zero shuffles (guide §2.4); the only join is the 1-row
    broadcast parameter attach (BroadcastNestedLoopJoin over a
    LocalRelation — see ``_prob_maps_params`` for why the
    probabilities ride data instead of literals).

    Built via ONE ``selectExpr`` from generated SQL text: constructing
    the 57 edge expressions as python Column objects costs seconds of
    py4j round trips PER ROUND (measured — the dominant cost of the
    whole trainer at bench scale, where the histogram is tiny and all
    walls are driver-side), while a generated string parses in a
    single JVM call to the IDENTICAL expression tree."""
    params = _prob_maps_params(wt.sparkSession, pmap)
    cols = [
        f"{_edge_prob_sql('word', j, i)} AS p_{j}_{i}"
        for j, i in lattice_pairs()
    ]
    return wt.crossJoin(F.broadcast(params)).selectExpr("word", "w", *cols)


def _pivot_lattice(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """One wide row per word type: p_{j}_{i} = prob of the piece on
    lattice edge (j, i), 0.0 when the substring is not in the vocab.
    Broadcast join + one word-keyed pivot aggregate (max over a
    singleton — exact). Kept as the DataFrame-probs semantic twin of
    ``lattice_wide_from_map`` (tests pin their equivalence through the
    python replay); the plans use the map form."""
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
    determinism contract). Levels are generated as SQL text and parsed
    in one ``selectExpr`` call per dependency level (f ascends while b
    descends, so level t adds f_t AND b_{W-t} together) — the python
    Column-object form cost seconds of py4j round trips per call (see
    ``lattice_wide_from_map``); the parsed expression trees are
    identical."""
    w = MAX_WORD_LEN
    l = MAX_PIECE_LEN  # noqa: E741
    adds = [
        "CAST(1.0 AS DOUBLE) AS f0",
        f"CASE WHEN length(word) = {w} THEN CAST(1.0 AS DOUBLE) "
        f"ELSE CAST(0.0 AS DOUBLE) END AS b{w}",
    ]
    for t in range(1, w + 1):
        i = t
        f_terms = " + ".join(
            f"f{j} * p_{j}_{i}" for j in range(max(0, i - l), i)
        )
        adds.append(f"({f_terms}) AS f{i}")
        bi = w - t
        b_terms = " + ".join(
            f"p_{bi}_{k} * b{k}"
            for k in range(bi + 1, min(bi + l, w) + 1)
        )
        if bi > 0:
            adds.append(
                f"CASE WHEN length(word) = {bi} THEN CAST(1.0 AS DOUBLE) "
                f"ELSE ({b_terms}) END AS b{bi}"
            )
        else:
            adds.append(f"({b_terms}) AS b0")  # words are non-empty
    adds.append("b0 AS z")
    # ONE selectExpr via lateral column aliases (each level references
    # the aliases defined before it in the same SELECT — Spark ≥3.4
    # resolves this to the identical nested-Project chain the per-level
    # loop built): 14 sequential py4j/analysis round trips per call
    # collapse to one. Round-12 optimization; the analyzed plan — and
    # therefore every value — is unchanged.
    return wide.selectExpr("*", *adds)


def _expected_count_edges(fb: DataFrame) -> DataFrame:
    """(piece, qc): 1e-6-quantized posterior expected counts from a
    forward/backward wide row — explode the (j, i) edges, drop zero
    quanta, integer-sum per piece (map-side partial aggregation)."""
    packs = ", ".join(
        f"named_struct('pc', substring(word, {j + 1}, {i - j}), "
        f"'q', CAST(floor(CAST(w AS DOUBLE) * "
        f"(f{j} * p_{j}_{i} * b{i} / z) * {QUANT} + "
        f"CAST(0.5 AS DOUBLE)) AS BIGINT))"
        for j, i in lattice_pairs()
    )
    ex = fb.selectExpr(f"explode(array({packs})) AS e").selectExpr(
        "e.pc AS piece", "e.q AS q"
    )
    return (
        ex.filter(F.col("q") > 0).groupBy("piece").agg(F.sum("q").alias("qc"))
    )


def em_expected_counts(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """E-step + quantization over DataFrame probs (the semantic twin
    kept for tests/one-shot callers): (piece, qc) — the 1e-6-quantized
    posterior expected count of every vocab piece, summed as exact
    integers across word types. Posterior of edge (j, i) is
    f_j · p_{j,i} · b_i / Z, weighted by the word-type count."""
    fb = _with_forward_backward(_pivot_lattice(pieces, probs))
    counts = _expected_count_edges(fb)
    # keep V fixed: every vocab piece survives, zero-count included
    return (
        probs.select("piece")
        .join(counts, "piece", "left")
        .select("piece", F.coalesce(F.col("qc"), F.lit(0)).alias("qc"))
    )


def em_round_rows(
    wt: DataFrame, vocab_rows: list[tuple[str, int]]
) -> list[tuple[str, int]]:
    """One EM round over the checkpointed histogram, vocab in / vocab
    out as driver rows: E-step projection (lattice from the literal
    prob map — no join, no pivot shuffle), M-step integer sum (the
    round's ONLY exchange, piece-keyed and partial-aggregated), then
    the vocab-bounded collect. Pieces absent from the vocab have p=0,
    hence posterior 0, hence never appear in the sum; zero-count vocab
    pieces are re-joined driver-side so V stays fixed."""
    pmap = probs_map(vocab_rows)
    fb = _with_forward_backward(lattice_wide_from_map(wt, pmap))
    got = {
        r["piece"]: r["qc"] for r in _expected_count_edges(fb).collect()
    }
    return [(piece, got.get(piece, 0)) for piece, _ in vocab_rows]


def train_rows(
    wt: DataFrame, rounds: int, top_k: int
) -> list[tuple[str, int]]:
    """Seed + ``rounds`` EM iterations over a (word, w) histogram
    (callers localCheckpoint ``wt`` — it is scanned once per round).
    Returns the final vocab as driver rows."""
    vocab_rows = collect_vocab(seed_vocab(candidate_pieces(wt), top_k))
    for _ in range(rounds):
        vocab_rows = em_round_rows(wt, vocab_rows)
    return vocab_rows


def unigram_train(
    docs: DataFrame, rounds: int, top_k: int
) -> DataFrame:
    """Train ``rounds`` EM iterations over the seeded candidate vocab;
    returns (piece, qc, p) — the final expected micro-counts and
    smoothed probabilities, the artifact a unigram tokenizer ships.
    Round-11 plan shape: histogram checkpoint + seed top-K job + one
    shuffle-light job per round (see the module docstring); the
    lattice-edge table is never materialized."""
    wt = word_types_truncated(docs).localCheckpoint()
    rows = train_rows(wt, rounds, top_k)
    return vocab_with_probs_df(docs.sparkSession, rows)


def _viterbi_chain(
    out: DataFrame, with_counts: bool
) -> DataFrame:
    """Append v0..vW (max-product scores) and, optionally, c0..cW
    (argmax piece counts) to a wide lattice row — the unrolled
    closed-form recurrence with the fixed ascending-j tie-break."""
    w = MAX_WORD_LEN
    l = MAX_PIECE_LEN  # noqa: E741
    adds = ["CAST(1.0 AS DOUBLE) AS v0"] + (
        ["0 AS c0"] if with_counts else []
    )
    for i in range(1, w + 1):
        js = list(range(max(0, i - l), i))
        terms = [f"v{j} * p_{j}_{i}" for j in js]
        vi = (
            f"greatest({', '.join(terms)})"
            if len(terms) > 1
            else terms[0]
        )
        adds.append(f"({vi}) AS v{i}")
        if with_counts:
            arms = " ".join(
                f"WHEN v{i} = {t} THEN c{j} + 1"
                for j, t in zip(js, terms)
            )
            adds.append(f"CASE {arms} END AS c{i}")
    # ONE selectExpr via lateral column aliases — see
    # ``_with_forward_backward`` (identical analyzed plan, ~25 fewer
    # py4j/analysis round trips per call).
    return out.selectExpr("*", *adds)


def _select_at_length(prefix: str, n: Column) -> Column:
    """CASE chain picking col ``{prefix}{len}``: x1..x{W-1} by word
    length, else x{W} (the determinism-contract arm order)."""
    w = MAX_WORD_LEN
    best = F.col(f"{prefix}{w}")
    for i in range(w - 1, 0, -1):
        best = F.when(n == i, F.col(f"{prefix}{i}")).otherwise(best)
    return best


def viterbi_encode(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """The serving-time encoder (round-9 verdict #4): per word type,
    the max-product Viterbi best segmentation's probability ``vbest``
    AND its piece count ``n_pieces`` — the number of tokens the
    tokenizer actually emits for the word. Returns (word, w, vbest,
    n_pieces). DataFrame-probs form (tests / one-shot callers); the
    plans use ``viterbi_encode_cols`` over the literal prob map.

    The count rides the same closed-form unrolled recurrence as the
    score: c_i = c_{argmax j}(v_j · p_{j,i}) + 1, with the argmax
    recovered by comparing v_i against each candidate term in FIXED
    ascending-j order (ties take the smallest j — the longest piece).
    Both engines compute v_i and every term from identical expression
    trees, so the float equality that picks the arm is bit-exact (the
    module's determinism contract); counts are exact integers."""
    n = F.length("word")
    out = _viterbi_chain(_pivot_lattice(pieces, probs), with_counts=True)
    return out.select(
        "word",
        "w",
        _select_at_length("v", n).alias("vbest"),
        _select_at_length("c", n).cast("long").alias("n_pieces"),
    )


def viterbi_encode_from_map(
    wt: DataFrame, pmap: dict[str, float]
) -> DataFrame:
    """``viterbi_encode`` from the literal prob map — one zero-shuffle
    projection over the histogram (round-11 optimization)."""
    n = F.length("word")
    out = _viterbi_chain(lattice_wide_from_map(wt, pmap), with_counts=True)
    return out.select(
        "word",
        "w",
        _select_at_length("v", n).alias("vbest"),
        _select_at_length("c", n).cast("long").alias("n_pieces"),
    )


def viterbi_encode_cols(
    df: DataFrame,
    head_col: Column,
    pmap: dict[str, float],
) -> DataFrame:
    """Append ``vbest``/``n_pieces`` for ``head_col`` (≤ W chars) to an
    arbitrary DataFrame — the joinless serving form: a consumer with
    full words computes its head's encode INLINE instead of joining a
    separately-encoded truncated table (identical expressions on the
    same head string ⇒ identical values)."""
    params = _prob_maps_params(df.sparkSession, pmap)
    tmp = df.withColumn("__head", head_col).crossJoin(F.broadcast(params))
    n = F.length("__head")
    wide = tmp.selectExpr(
        "*",
        *[
            f"{_edge_prob_sql('__head', j, i)} AS p_{j}_{i}"
            for j, i in lattice_pairs()
        ],
    )
    out = _viterbi_chain(wide, with_counts=True)
    keep = [c for c in df.columns]
    return out.select(
        *keep,
        _select_at_length("v", n).alias("vbest"),
        _select_at_length("c", n).cast("long").alias("n_pieces"),
    )


def viterbi_stats(pieces: DataFrame, probs: DataFrame) -> DataFrame:
    """Serving-side lattice audit for one vocab: per word type, the
    max-product Viterbi score v (best single segmentation probability),
    the total probability Z, and the posterior expected piece count —
    all closed-form over the same wide lattice row. Returns one row
    per word type: (word, w, v, z, exp_pieces). DataFrame-probs form;
    ``viterbi_stats_from_map`` is the plans' joinless twin."""
    return _viterbi_stats_over(_pivot_lattice(pieces, probs))


def viterbi_stats_from_map(
    wt: DataFrame, pmap: dict[str, float]
) -> DataFrame:
    """``viterbi_stats`` from the literal prob map — one zero-shuffle
    projection over the histogram (round-11 optimization)."""
    return _viterbi_stats_over(lattice_wide_from_map(wt, pmap))


def _viterbi_stats_over(wide: DataFrame) -> DataFrame:
    n = F.length("word")
    fb = _with_forward_backward(wide)
    out = _viterbi_chain(fb, with_counts=False)
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
        _select_at_length("v", n).alias("v"),
        F.col("z").alias("z"),
        ec.alias("exp_pieces"),
    )
