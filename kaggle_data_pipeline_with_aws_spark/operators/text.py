"""Text-analysis operators for large-scale training-data pipelines.

Everything here is pure built-in column expressions (JVM-side, inside
whole-stage codegen) — no Python UDFs. Each op is a narrow map over the
documents table: embarrassingly parallel, no shuffle, scales linearly
with input splits.

Portability note: ``portable_hash`` is an md5-derived 60-bit hash kept
within 2^31 so Spark and any ANSI-SQL engine (the DuckDB oracle)
produce bit-identical values — the correctness twin of the scale path
(``F.xxhash64``, which is faster but engine-specific). Operators take a
``portable`` flag choosing between them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_MOD = 2_147_483_647  # 2^31 - 1

# Tiny per-language stopword marker lists for the n-gram/stopword
# language-ID heuristic. Deliberately small and hard-coded: the operator
# is the deterministic argmax scaffold; swap lists for real ones.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "ist", "nicht", "das"],
    "en": ["the", "a", "and", "is", "not", "of"],
    "es": ["el", "la", "y", "es", "no", "de"],
    "fr": ["le", "la", "et", "est", "pas", "de"],
    "zh": ["de5", "shi4", "bu4", "le5", "zai4", "he2"],
}

STOPWORDS_EN = ["the", "a", "an", "and", "or", "is", "of", "to", "in"]


def tokens(col: str | Column = "text") -> Column:
    """Whitespace tokenization — the baseline token counter."""
    return F.split(col if isinstance(col, Column) else F.col(col), " ")


def token_count(col: str | Column = "text") -> Column:
    return F.array_size(tokens(col)).cast("long")


def bpe_ish_token_count(col: str | Column = "text") -> Column:
    """A BPE-ish proxy: split on whitespace AND sub-word boundaries
    (letter/digit transitions, punctuation). Regex-based, JVM-side."""
    c = col if isinstance(col, Column) else F.col(col)
    pieces = F.split(
        F.regexp_replace(
            F.regexp_replace(c, r"([0-9]+)", r" $1 "), r"([^\w\s]+)", r" $1 "
        ),
        r"\s+",
    )
    return F.array_size(F.filter(pieces, lambda x: x != "")).cast("long")


def portable_hash(col: Column, mod: int = HASH_MOD) -> Column:
    """Portable content hash: first 15 hex digits (60 bits) of md5, mod p.

    md5 is natively implemented and bit-identical in Spark, DuckDB, and
    Python — the hash stays oracle-reproducible while running ~2× faster
    than the per-char interpreted fold it replaces (higher-order-function
    lambdas don't codegen). For the scale path use ``F.xxhash64``
    instead — no hex round-trip, another ~2× cheaper.
    """
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long"),
        F.lit(mod),
    )


def _hex_to_bigint_sql(hex_expr: str) -> str:
    """DuckDB 1.0 lacks a hex→int cast; fold the hex chars."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform("
        f"string_split_regex({hex_expr}, ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(acc, x) -> acc * 16 + x)"
    )


def portable_hash_sql(expr: str, mod: int = HASH_MOD) -> str:
    """The DuckDB twin of ``portable_hash`` for oracle generation."""
    return f"({_hex_to_bigint_sql(f'substr(md5({expr}), 1, 15)')} % {mod})"


_H60_MOD = 1 << 30


def portable_hash60(col: Column) -> Column:
    """60-bit portable hash from two independent 30-bit md5 segments:
    h = lo + (hi << 30), lo/hi = 32-bit hex windows of the digest mod
    2^30. Always < 2^60 — headroom for bit arithmetic in any engine."""
    lo = F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(_H60_MOD),
    )
    hi = F.pmod(
        F.conv(F.substring(F.md5(col), 9, 8), 16, 10).cast("long"),
        F.lit(_H60_MOD),
    )
    return lo + F.shiftleft(hi, 30)


def portable_hash60_sql(expr: str) -> str:
    """DuckDB twin of ``portable_hash60``."""
    lo = f"({_hex_to_bigint_sql(f'substr(md5({expr}), 1, 8)')} % {_H60_MOD})"
    hi = f"({_hex_to_bigint_sql(f'substr(md5({expr}), 9, 8)')} % {_H60_MOD})"
    return f"({lo} + ({hi} << 30))"


def word_ngrams(tok: Column, n: int = 3) -> Column:
    """All n-word shingles in order, repeats kept.

    Built by zipping the token array with its own shifted slices
    (n-1 chained ``zip_with``) rather than
    ``transform(sequence(...), i -> element_at(...))``: higher-order
    lambdas run interpreted, and per-index ``element_at`` made the
    index-based form ~6× slower; the slice+zip form also degrades
    safely to an empty array for docs shorter than n tokens (the
    sequence form emits a *descending* index range there)."""
    ln = F.greatest(F.array_size(tok) - (n - 1), F.lit(0))
    acc = F.slice(tok, 1, ln)
    for off in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(tok, 1 + off, ln),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return acc


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the dedup/minhash input)."""
    return F.array_distinct(word_ngrams(tok, n))


def repetition_ratio(col: str | Column = "text", n: int = 2) -> Column:
    """Gopher-style repetition score: 1 − distinct/total word n-grams.
    High values mean boilerplate/looped text — a standard LLM-corpus
    quality gate. Pure array expressions: map-side only, no shuffle."""
    g = word_ngrams(tokens(col), n)
    total = F.array_size(g)
    return F.when(
        total > 0,
        F.round(F.lit(1.0) - F.array_size(F.array_distinct(g)) / total, 6),
    ).otherwise(F.lit(0.0))


def char_ratio(col: Column, pattern: str) -> Column:
    """Share of characters matching a regex class — punctuation ratio,
    alpha ratio etc. length-of-filtered / length."""
    total = F.length(col)
    kept = F.length(F.regexp_replace(col, pattern, ""))
    return F.when(total > 0, (total - kept) / total).otherwise(F.lit(0.0))


def stopword_ratio(tok: Column, stopwords: list[str] | None = None) -> Column:
    words = stopwords or STOPWORDS_EN
    hits = F.size(F.filter(tok, lambda t: t.isin(*words)))
    return F.when(
        F.array_size(tok) > 0, hits / F.array_size(tok)
    ).otherwise(F.lit(0.0))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring feature vector per document: lengths, mean token
    length, stopword ratio, punctuation ratio, plus a composite score.
    All arithmetic double-precision with explicit rounding so oracle
    comparison is exact."""
    tok = tokens(text_col)
    n_tok = F.array_size(tok).cast("long")
    n_chars = F.length(text_col).cast("long")
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(
            F.when(n_tok > 0, n_chars.cast("double") / n_tok).otherwise(0.0), 6
        ).alias("mean_token_len"),
        F.round(stopword_ratio(tok), 6).alias("stopword_ratio"),
        F.round(char_ratio(F.col(text_col), r"[^\w\s]"), 6).alias("punct_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per language, count marker hits in the
    token set; predict the argmax (ties broken by language code asc —
    fully deterministic). The structure is the production shape (N
    parallel counters + argmax); the marker lists are placeholders."""
    tok = tokens(text_col)
    scores = [
        F.struct(
            F.size(F.filter(tok, lambda t: t.isin(*words))).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # array_max over struct(hits, lang): max hits, then max lang — to get
    # asc-lang tiebreak deterministically, negate via reverse sort order:
    # use sort_array desc on struct(hits, neg_rank) — simpler: sort by
    # (hits desc, lang asc) == array_min of struct(-hits, lang).
    neg = [
        F.struct(
            (-F.size(F.filter(tok, lambda t: t.isin(*words)))).alias("neg_hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    best = F.array_min(F.array(*neg))
    return df.select(
        "doc_id",
        best.getField("lang").alias("predicted_lang"),
        (-best.getField("neg_hits")).cast("long").alias("marker_hits"),
    )


def fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: md5 digest + the portable rolling hash."""
    return df.select(
        "doc_id",
        F.md5(F.col(text_col)).alias("md5_fingerprint"),
        portable_hash(F.col(text_col)).alias("rolling_hash"),
    )


# URL / email / long-digit-run scrubbing patterns for training-data
# cleaning. Order matters (URLs before bare domains would, etc.); each
# is a single JVM-side regexp_replace — one codegen'd pass per pattern.
CLEAN_PATTERNS: list[tuple[str, str]] = [
    (r"https?://\S+", "<URL>"),
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\d{7,}", "<NUM>"),
]


def clean_text(col: str | Column = "text") -> Column:
    """PII/noise scrub: URLs, emails, long digit runs → typed
    placeholder tokens, then whitespace normalization. All
    regexp_replace — narrow map, no shuffle, scales with splits."""
    c = col if isinstance(col, Column) else F.col(col)
    for pat, repl in CLEAN_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def hash_sample(
    key: str | Column, pct: int, mod: int = 100
) -> Column:
    """Deterministic sampling predicate: keep rows where
    hash(key) % mod < pct. Unlike ``F.rand`` this is reproducible
    across runs, engines, and retries (a failed task resamples the SAME
    rows) — the only safe way to sample a 100 TB training corpus that
    must be re-creatable. Stratify by applying per group."""
    k = key if isinstance(key, Column) else F.col(key)
    return F.pmod(portable_hash(k.cast("string")), F.lit(mod)) < pct


def stratified_hash_sample(
    key: str | Column,
    strata: str | Column,
    rates: dict[str, int],
    default_pct: int,
    mod: int = 100,
) -> Column:
    """Per-stratum deterministic sampling predicate — e.g. keep 30% of
    English but 10% of every other language. Same reproducibility
    contract as ``hash_sample``; the per-row rate is a codegen'd CASE
    over the stratum column, so the whole predicate evaluates inside
    the scan stage."""
    s = strata if isinstance(strata, Column) else F.col(strata)
    pct: Column | None = None
    for value, rate in rates.items():
        cond = s == value
        pct = F.when(cond, rate) if pct is None else pct.when(cond, rate)
    pct = F.lit(default_pct) if pct is None else pct.otherwise(default_pct)
    k = key if isinstance(key, Column) else F.col(key)
    return F.pmod(portable_hash(k.cast("string")), F.lit(mod)) < pct


def vocabulary(
    df: DataFrame, text_col: str = "text", top_n: int | None = None
) -> DataFrame:
    """Corpus vocabulary: token → document frequency + total count.
    Explode + two-level agg; partial aggregation makes the shuffle
    carry one row per (partition, token), not per occurrence."""
    tok = df.select(
        "doc_id", F.explode(tokens(text_col)).alias("token")
    ).filter(F.col("token") != "")
    vocab = tok.groupBy("token").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("doc_freq"),
    )
    if top_n is not None:
        vocab = vocab.orderBy(
            F.col("n_occurrences").desc(), F.col("token").asc()
        ).limit(top_n)
    return vocab
