"""Unigram-LM EM trainer vs a plain-python replay (round-8 verdict #2).

The python reference mirrors the operator's determinism contract
exactly — same truncation, same lattice, same left-associated float
sums in the same index order, same 1e-6 edge quantization — so the
expected micro-counts must match INTEGER-EXACTLY and the smoothed
probabilities bit-for-bit.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import unigram as U

W, L, Q = U.MAX_WORD_LEN, U.MAX_PIECE_LEN, U.QUANT


def py_word_types(texts: list[str]) -> dict[str, int]:
    wt: dict[str, int] = {}
    for t in texts:
        for tok in t.split(" "):
            tok = tok[:W]
            if len(tok) >= 1:
                wt[tok] = wt.get(tok, 0) + 1
    return wt


def py_seed(wt: dict[str, int], top_k: int) -> dict[str, int]:
    hist: dict[str, int] = {}
    for word, w in wt.items():
        n = len(word)
        for j, i in U.lattice_pairs():
            if i <= n:
                pc = word[j:i]
                hist[pc] = hist.get(pc, 0) + w
    vocab = {p: c for p, c in hist.items() if len(p) == 1}
    multis = sorted(
        ((p, c) for p, c in hist.items() if len(p) >= 2),
        key=lambda x: (-x[1], x[0]),
    )[:top_k]
    vocab.update(dict(multis))
    return vocab


def py_probs(vocab: dict[str, int]) -> dict[str, float]:
    t, v = sum(vocab.values()), len(vocab)
    return {p: (c + 1) / (t + v) for p, c in vocab.items()}


def py_lattice(word: str, probs: dict[str, float]):
    """(f, b, p) arrays with the operator's exact association order."""
    n = len(word)
    p: dict[tuple[int, int], float] = {}
    for j, i in U.lattice_pairs():
        p[(j, i)] = probs.get(word[j:i], 0.0) if i <= n else 0.0
    f = [0.0] * (W + 1)
    f[0] = 1.0
    for i in range(1, W + 1):
        acc = None
        for j in range(max(0, i - L), i):
            t = f[j] * p[(j, i)]
            acc = t if acc is None else acc + t
        f[i] = acc
    b = [0.0] * (W + 1)
    b[W] = 1.0 if n == W else 0.0
    for i in range(W - 1, -1, -1):
        acc = None
        for k in range(i + 1, min(i + L, W) + 1):
            t = p[(i, k)] * b[k]
            acc = t if acc is None else acc + t
        b[i] = 1.0 if (i == n and i > 0) else acc
    return f, b, p


def py_em_round(
    wt: dict[str, int], vocab: dict[str, int]
) -> dict[str, int]:
    probs = py_probs(vocab)
    counts = {p: 0 for p in vocab}
    for word, w in wt.items():
        f, b, p = py_lattice(word, probs)
        z = b[0]
        for j, i in U.lattice_pairs():
            c = f[j] * p[(j, i)] * b[i] / z
            q = math.floor(w * c * Q + 0.5)
            if q > 0:
                counts[word[j:i]] += q
    return counts


def py_train(texts: list[str], rounds: int, top_k: int):
    wt = py_word_types(texts)
    vocab = py_seed(wt, top_k)
    for _ in range(rounds):
        vocab = py_em_round(wt, vocab)
    probs = py_probs(vocab)
    return {p: (vocab[p], probs[p]) for p in vocab}


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the rain in spain falls mainly on the plain",
    "tokenizer training needs subword statistics",
    "statistics of subword pieces drive the vocabulary",
    "aaaa aaaaaaaa aaaaaaaaaaaaaaaa abab ababab",
    "internationalization and localization",
    "the the the fox fox dog",
    "pack my box with five dozen liquor jugs",
]


def test_em_matches_python_replay(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = {
        r.piece: (r.qc, r.p)
        for r in U.unigram_train(docs, rounds=2, top_k=40).collect()
    }
    want = py_train(TEXTS, rounds=2, top_k=40)
    assert set(got) == set(want)
    for piece in want:
        assert got[piece][0] == want[piece][0], piece  # exact integers
        assert got[piece][1] == want[piece][1], piece  # identical floats


def test_seed_vocab_coverage_and_topk(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    wt = U.word_types_truncated(docs)
    pieces = U.candidate_pieces(wt)
    vocab = {r.piece: r.qc for r in U.seed_vocab(pieces, 10).collect()}
    singles = {p for p in vocab if len(p) == 1}
    chars = {c for t in TEXTS for w in t.split(" ") for c in w[:W]}
    assert singles == chars  # full coverage: every char is a piece
    assert sum(1 for p in vocab if len(p) >= 2) == 10
    assert vocab == py_seed(py_word_types(TEXTS), 10)


def test_viterbi_stats_bounds(spark):
    """0 < v ≤ z, 1 ≤ exp_pieces ≤ word length, for every word type."""
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    pieces = U.candidate_pieces(U.word_types_truncated(docs)).localCheckpoint()
    probs = U.normalized_probs(U.seed_vocab(pieces, 40))
    rows = U.viterbi_stats(pieces, probs).collect()
    assert rows
    for r in rows:
        assert 0 < r.v <= r.z + 1e-15, r
        assert 0.999999 <= r.exp_pieces <= len(r.word) + 1e-9, r


def test_em_mass_conservation(spark):
    """Per word, posterior edge counts sum to the expected piece count
    — so Σ qc ≈ Q × Σ_w w × exp_pieces (quantization error ≤ n_edges/2
    per word type)."""
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    pieces = U.candidate_pieces(U.word_types_truncated(docs)).localCheckpoint()
    probs = U.normalized_probs(U.seed_vocab(pieces, 40))
    qc_total = (
        U.em_expected_counts(pieces, probs)
        .agg(F.sum("qc").alias("s"))
        .collect()[0]
        .s
    )
    exp = (
        U.viterbi_stats(pieces, probs)
        .select((F.col("w") * F.col("exp_pieces")).alias("x"))
        .agg(F.sum("x").alias("s"))
        .collect()[0]
        .s
    )
    n_types = len(py_word_types(TEXTS))
    assert abs(qc_total - exp * Q) <= 26 * n_types


def py_viterbi_encode(
    word: str, probs: dict[str, float]
) -> tuple[float, int]:
    """Python replay of operators/unigram.py::viterbi_encode — same
    max-product recurrence, same ascending-j tie-break (the comparison
    against the recomputed term, not an argmax shortcut)."""
    f, b, p = py_lattice(word, probs)
    n = len(word)
    v = [0.0] * (W + 1)
    c = [0] * (W + 1)
    v[0] = 1.0
    for i in range(1, W + 1):
        terms = [
            (j, v[j] * p[(j, i)]) for j in range(max(0, i - L), i)
        ]
        v[i] = max(t for _, t in terms)
        for j, t in terms:  # ascending j: first equal term wins
            if v[i] == t:
                c[i] = c[j] + 1
                break
    return v[n], c[n]


def test_viterbi_encode_matches_python_replay(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    pieces = U.candidate_pieces(U.word_types_truncated(docs)).localCheckpoint()
    probs_df = U.normalized_probs(U.seed_vocab(pieces, 40))
    probs = {r.piece: r.p for r in probs_df.collect()}
    rows = U.viterbi_encode(pieces, probs_df).collect()
    assert rows
    for r in rows:
        vb, nb = py_viterbi_encode(r.word, probs)
        assert r.vbest == vb, r.word   # identical floats
        assert r.n_pieces == nb, r.word  # exact path length
        assert 1 <= r.n_pieces <= len(r.word)


def test_fallback_accounting_on_overlong_words(spark):
    """Round-11 (round-10 verdict #4): words beyond the W-char lattice
    encode as head-Viterbi + one token per tail character, split into
    FALLBACK (tail char in the trained single vocab) and UNK (never
    seen by the trainer). End-to-end on a synthetic corpus with
    >W-char words: the d210 registry plan vs its registered DuckDB
    oracle on the SAME staged table, with nonzero fallback AND UNK
    masses. (Every shipped dataset stays within W=12 — the round-10
    width raise absorbed even the 100x corpus's 11-char words — so
    this synthetic corpus is what exercises the arms.)"""
    import os
    import tempfile

    import duckdb

    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    # 'abcdefghijkl' is the 12-char head; tails: 'ab' (chars in the
    # head vocab -> fallback) and 'QZ' (never in any head -> UNK)
    texts = [
        "abcdefghijklab cd cd ab",        # 14-char word, known tail
        "abcdefghijklQZ cd ab ab cd",     # 14-char word, unseen tail
        "ab cd abcd",
    ]
    sf_dir = tempfile.mkdtemp(prefix="unigram-fb-")
    docs = spark.createDataFrame(
        [(i, t, "en", "synth", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(os.path.join(sf_dir, "documents.parquet"))

    got = registry.QUERIES["d210_unigram_viterbi_encode"](
        spark, sf_dir
    ).collect()
    overflow = [r for r in got if r.wlen == 13]
    assert len(overflow) == 1
    o = overflow[0]
    assert o.n_truncated_types == 2
    assert o.n_fallback_tokens == 2  # 'a'+'b' tail chars, one word
    assert o.n_unk_tokens == 2       # 'Q'+'Z', one word
    # tokens include the tail: n_tokens = head pieces + tail chars
    assert o.n_tokens >= o.n_fallback_tokens + o.n_unk_tokens

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{os.path.join(sf_dir, 'documents.parquet')}/*.parquet'"
    )
    want = con.execute(
        registry.ORACLE_SQL["d210_unigram_viterbi_encode"]
    ).fetchall()
    got_t = [tuple(r) for r in got]
    assert sorted(got_t) == sorted(tuple(r) for r in want)
