"""Deduplication operators for training-data pipelines.

Four families, each expressed as shuffle-conscious DataFrame plans:

- **Exact**: hash-groupBy on content (or ``dropDuplicates``) — one
  shuffle on the content hash, map-side partial agg first.
- **N-gram Jaccard**: shingle-explode → self-equi-join on shingle →
  per-pair intersection counts → Jaccard. The join key is the shingle,
  so only docs *sharing* a shingle ever meet (candidate generation and
  scoring in one plan). Hot shingles are the skew risk at scale —
  ``max_shingle_doc_freq`` drops stop-shingles before the join, the
  standard scale mitigation.
- **MinHash + LSH**: k affine min-hashes over shingle hashes →
  signatures; band the signature (b bands × r rows), groupBy band-key →
  candidate pairs only within buckets; estimated Jaccard = matching
  signature fraction. Turns O(n²) pair scoring into near-linear work.
- **SimHash**: weighted bit-vote over token hashes → 60-bit
  fingerprint; near-dup pairs via banded fingerprint chunks + Hamming
  distance ≤ d.

All hashes use the portable md5-derived hash (operators/text.py) when
``portable=True`` so the DuckDB oracle reproduces them bit-for-bit;
the scale path flips to ``F.xxhash64``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..sources.readers import spread_for_compute
from .text import HASH_MOD, portable_hash, tokens, word_shingles

# Fixed affine minhash parameters (a, b) — odd multipliers, generated
# once from a seeded RNG and baked in as constants so every run (and the
# SQL oracle) agrees. h_i(x) = (a_i * x + b_i) mod (2^31 - 1).
MINHASH_PARAMS: list[tuple[int, int]] = [
    (1203114875, 722127386), (1823585963, 1822528699), (573325049, 239543733),
    (1011175299, 1972183799), (442471603, 1910486145), (1237530991, 966939195),
    (2072496709, 760914667), (1767373757, 501056677), (874552741, 1479790269),
    (1294649447, 2000259879), (1039957357, 768126829), (658071109, 1165550209),
    (1821386743, 1154448979), (204483571, 1281814183), (902930725, 613122351),
    (1116461119, 1700750281), (840066523, 1704997115), (244854823, 1942292521),
    (563761601, 1597759947), (833507557, 193217627), (1642373099, 1766249797),
    (680896167, 1752871491), (701754445, 816896129), (1280819965, 1363160661),
    (1790801711, 1109211917), (1384772509, 783907469), (1128181441, 569227793),
    (383704849, 1677993395), (1596887323, 1302836099), (576348247, 1798043321),
    (1026484127, 1404406755), (1760751077, 862198727),
]
NUM_HASHES = len(MINHASH_PARAMS)  # 32
LSH_BANDS = 8
LSH_ROWS = NUM_HASHES // LSH_BANDS  # 4

SIMHASH_BITS = 60
SIMHASH_CHUNKS = 4
SIMHASH_CHUNK_BITS = SIMHASH_BITS // SIMHASH_CHUNKS  # 15


def _content_hash(col: Column, portable: bool) -> Column:
    return portable_hash(col) if portable else F.xxhash64(col)


def _int_ceil(x: Column) -> Column:
    """``ceil`` for the PPJoin pruning bounds, guarded against the
    1-ulp float edge: ``0.8 * 35`` evaluates to ``28.000000000000004``
    in binary doubles, and a bare ``ceil`` would round that to 29 —
    tightening the bound by 1 and pruning a pair whose true similarity
    sits exactly on the threshold (a false negative the verify stage
    never sees). Subtracting 1e-9 cancels that error; when the product
    is genuinely fractional it can only LOOSEN the bound by at most 1
    (an extra candidate the exact verify stage then discards), so
    exactness is preserved in both directions."""
    return F.ceil(x - F.lit(1e-9))


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of identical content: one row per distinct text with the
    representative (min) doc_id and the duplicate count. groupBy on the
    text itself; at scale pre-hash to a 64-bit key to shrink shuffle
    bytes (``exact_dedup_keep_first``)."""
    return df.groupBy(text_col).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count("*").alias("n_copies"),
    )


def exact_dedup_keep_first(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The scale form: shuffle on xxhash64(text) (8 bytes/row instead of
    the full document), keep min doc_id per hash, anti-join nothing —
    semi-join survivors back for payload columns."""
    hashed = df.withColumn("__h", F.xxhash64(F.col(text_col)))
    keep = hashed.groupBy("__h").agg(F.min("doc_id").alias("doc_id"))
    return df.join(keep, "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# Shingles + n-gram Jaccard
# ---------------------------------------------------------------------------

def shingle_table(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """(doc_id, shingle) — distinct n-gram shingles per document.
    ``max_shingle_doc_freq`` removes shingles appearing in more than N
    docs (stop-shingles): they blow up the self-join quadratically and
    carry no dedup signal — the skew mitigation at 100 TB."""
    sh = spread_for_compute(df).select(
        "doc_id",
        F.explode(word_shingles(tokens(text_col), n)).alias("shingle"),
    )
    if max_shingle_doc_freq is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") > max_shingle_doc_freq)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")
    return sh


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: drop corpus documents sharing any
    n-word shingle with an evaluation set — the standard guard against
    test-set leakage into training data.

    Scale shape: eval sets are tiny next to the corpus, so the
    benchmark shingle set BROADCASTS; the corpus side is one explode +
    broadcast semi-join + distinct on contaminated ids + broadcast anti
    join — the 100 TB corpus is never shuffled, only its (small) list
    of contaminated ids is."""
    bench_sh = (
        benchmark.select(
            F.explode(word_shingles(tokens(text_col), n)).alias("shingle")
        )
        .distinct()
    )
    corp_sh = corpus.select(
        id_col, F.explode(word_shingles(tokens(text_col), n)).alias("shingle")
    )
    contaminated = (
        corp_sh.join(F.broadcast(bench_sh), "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )
    return corpus.join(F.broadcast(contaminated), id_col, "left_anti")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """Candidate pairs with shingle-Jaccard ≥ threshold — EXACT, via
    prefix filtering (the SSJoin/PPJoin bound: under a global shingle
    order, two sets with J ≥ t must collide within their first
    |x| − ⌈t·|x|⌉ + 1 shingles; ordering by ascending global frequency
    makes those prefixes the RAREST shingles).

    The naive form — self-join the full inverted index on shingle —
    emits f² pair rows for every shingle of frequency f, which on a
    dup-heavy corpus is quadratic in the hottest posting list (it
    OOM'd a 10× local run; at 100 TB it is unrunnable). Here only
    prefix shingles generate candidates, and the full posting lists
    are touched again only to VERIFY the (near-dup-sized) candidate
    list, via two equi-joins keyed on (doc_id) and (shingle, doc_id).
    Output is provably identical to the naive plan for the given
    threshold.
    """
    sh = shingle_table(df, text_col, n, max_shingle_doc_freq).cache()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
    rk_w = Window.partitionBy("doc_id").orderBy(
        F.col("__f").asc(), F.col("shingle").asc()
    )
    prefix = (
        sh.join(freq, "shingle")
        .join(counts, "doc_id")
        .withColumn("__rk", F.row_number().over(rk_w))
        .filter(
            F.col("__rk")
            <= F.col("n_shingles")
            - _int_ceil(F.lit(threshold) * F.col("n_shingles"))
            + 1
        )
        .select("doc_id", "shingle", "__rk", "n_shingles")
    )
    pa = prefix.select(
        F.col("doc_id").alias("doc_id_1"),
        F.col("shingle").alias("__s"),
        F.col("__rk").alias("__rk1"),
        F.col("n_shingles").alias("__n1"),
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_id_2"),
        F.col("shingle").alias("__s"),
        F.col("__rk").alias("__rk2"),
        F.col("n_shingles").alias("__n2"),
    )
    # PPJoin residuals on the prefix collision (all exactness-
    # preserving for J ≥ t): length filter (t·|x| ≤ |y| ≤ |x|/t) and
    # positional filter (the overlap still reachable after this
    # prefix position must meet the equivalent-overlap bound
    # α = ⌈t/(1+t)·(|x|+|y|)⌉).
    alpha = _int_ceil(
        F.lit(threshold / (1.0 + threshold)) * (F.col("__n1") + F.col("__n2"))
    )
    candidates = (
        pa.join(pb, "__s")
        .filter(
            (F.col("doc_id_1") < F.col("doc_id_2"))
            & (F.col("__n2") >= _int_ceil(F.lit(threshold) * F.col("__n1")))
            & (F.col("__n1") >= _int_ceil(F.lit(threshold) * F.col("__n2")))
            & (
                F.least(
                    F.col("__n1") - F.col("__rk1"),
                    F.col("__n2") - F.col("__rk2"),
                )
                + 1
                >= alpha
            )
        )
        .select("doc_id_1", "doc_id_2")
        .distinct()
    )
    # shuffle_hash hints: the exploded posting lists are data-sized,
    # but Catalyst's plan-time row estimate for explode() output is
    # the INPUT table's, so without the hint it happily tries to
    # broadcast millions of shingle rows and dies building the hash
    # relation. (AQE can't save a broadcast chosen at planning.)
    sh_a = sh.select(
        F.col("doc_id").alias("doc_id_1"), F.col("shingle").alias("__sh")
    ).hint("shuffle_hash")
    sh_b = sh.select(
        F.col("doc_id").alias("doc_id_2"), F.col("shingle").alias("__sh")
    ).hint("shuffle_hash")
    inter = (
        candidates.join(sh_a, "doc_id_1")
        .join(sh_b, ["doc_id_2", "__sh"])
        .groupBy("doc_id_1", "doc_id_2")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(
        F.col("doc_id").alias("doc_id_1"), F.col("n_shingles").alias("n_1")
    )
    cb = counts.select(
        F.col("doc_id").alias("doc_id_2"), F.col("n_shingles").alias("n_2")
    )
    return (
        inter.join(F.broadcast(ca), "doc_id_1")
        .join(F.broadcast(cb), "doc_id_2")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_1") + F.col("n_2") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_id_1", "doc_id_2", "n_common", "jaccard")
    )


def shingle_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.9,
    max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """Ordered pairs where doc_1's shingle set is (mostly) CONTAINED in
    doc_2's: containment = |A∩B| / |A| ≥ threshold.

    Jaccard misses sub-document duplication — a paragraph pasted into a
    much larger page scores low Jaccard but containment ≈ 1. This is
    the standard asymmetric complement for curation dedup.

    EXACT via the asymmetric PPJoin prefix bound (the same machinery as
    ``ngram_jaccard_pairs``, adapted to containment): for
    |A∩B|/|A| ≥ t the contained side needs overlap ≥ ⌈t·|A|⌉, so under
    a global rarest-first shingle order at least one of A's first
    |A| − ⌈t·|A|⌉ + 1 shingles must appear in B (pigeonhole). Only that
    prefix of the CONTAINED side generates candidates — joined against
    the FULL posting list of the container side (containment puts no
    upper bound on |B|, so the container side cannot be prefixed) —
    then two exactness-preserving residuals prune the collision:
    a length filter (|B| ≥ ⌈t·|A|⌉ — the container must hold at least
    the required overlap) and a positional filter (at the first common
    shingle, ranked rk1 in A and rk2 in B, the reachable overlap is
    1 + min(|A|−rk1, |B|−rk2) — both docs' ranks follow the one global
    order, so every other common shingle sits strictly later in BOTH).
    The naive inverted-index self-join emits f² pair rows per shingle
    of document-frequency f (the exact shape that OOM'd d06's 10× run
    before its PPJoin rewrite); here hot shingles almost never land in
    a prefix, and the full lists are touched again only to VERIFY the
    (near-dup-sized) candidate list. Output is provably identical to
    the naive plan.
    """
    sh = shingle_table(df, text_col, n, max_shingle_doc_freq).cache()
    counts = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    freq = sh.groupBy("shingle").agg(F.count("*").alias("__f"))
    rk_w = Window.partitionBy("doc_id").orderBy(
        F.col("__f").asc(), F.col("shingle").asc()
    )
    ranked = (
        sh.join(freq, "shingle")
        .join(counts, "doc_id")
        .withColumn("__rk", F.row_number().over(rk_w))
        .select("doc_id", "shingle", "__rk", "n_shingles")
    )
    req = _int_ceil(F.lit(threshold) * F.col("__n1"))  # overlap ≥ ⌈t·|A|⌉
    pa = ranked.filter(
        F.col("__rk")
        <= F.col("n_shingles")
        - _int_ceil(F.lit(threshold) * F.col("n_shingles"))
        + 1
    ).select(
        F.col("doc_id").alias("contained_id"),
        F.col("shingle").alias("__s"),
        F.col("__rk").alias("__rk1"),
        F.col("n_shingles").alias("__n1"),
    )
    pb = ranked.select(
        F.col("doc_id").alias("container_id"),
        F.col("shingle").alias("__s"),
        F.col("__rk").alias("__rk2"),
        F.col("n_shingles").alias("__n2"),
    ).hint("shuffle_hash")  # full posting list: never broadcast-sized
    candidates = (
        pa.join(pb, "__s")
        .filter(
            (F.col("contained_id") != F.col("container_id"))
            & (F.col("__n2") >= req)
            & (
                F.least(
                    F.col("__n1") - F.col("__rk1"),
                    F.col("__n2") - F.col("__rk2"),
                )
                + 1
                >= req
            )
        )
        .select("contained_id", "container_id")
        .distinct()
    )
    # Verify stage: exact intersection counts for the candidate pairs
    # only. shuffle_hash hints for the same reason as in
    # ngram_jaccard_pairs — Catalyst's row estimate for explode output
    # is the input table's, so it would otherwise try to broadcast the
    # full shingle table and die building the hash relation.
    sh_a = sh.select(
        F.col("doc_id").alias("contained_id"), F.col("shingle").alias("__sh")
    ).hint("shuffle_hash")
    sh_b = sh.select(
        F.col("doc_id").alias("container_id"), F.col("shingle").alias("__sh")
    ).hint("shuffle_hash")
    inter = (
        candidates.join(sh_a, "contained_id")
        .join(sh_b, ["container_id", "__sh"])
        .groupBy("contained_id", "container_id")
        .agg(F.count("*").alias("n_common"))
    )
    ca = counts.select(
        F.col("doc_id").alias("contained_id"),
        F.col("n_shingles").alias("n_contained"),
    )
    return (
        inter.join(F.broadcast(ca), "contained_id")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.col("n_contained"), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("contained_id", "container_id", "n_common", "containment")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame, text_col: str = "text", portable: bool = True, n: int = 3
) -> DataFrame:
    """Per-doc k=32 minhash signature as columns h0..h31.

    One shingle explode; each h_i is an independent MIN aggregate of an
    affine transform of the shingle hash — k partial-aggregating MINs in
    a single groupBy pass, no extra shuffles."""
    sh = shingle_table(df, text_col, n)
    hashed = sh.withColumn(
        "__sh", F.pmod(_content_hash(F.col("shingle"), portable), F.lit(HASH_MOD))
    )
    aggs = [
        F.min(
            F.pmod(F.lit(a) * F.col("__sh") + F.lit(b), F.lit(HASH_MOD))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures_vectorized(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Arrow-batched twin of ``minhash_signatures`` (portable hash only).

    The whole signature — tokenize, shingle, md5-derived hash, 32
    affine mins — happens in one numpy pass per batch, turning the
    shingle-explode + 32-min-agg groupBy (a shuffle of the exploded
    shingle table) into a NARROW MAP: at 100 TB no shingle row ever
    leaves its input partition.  Bit-identical by construction:
    ``hashlib.md5`` == ``F.md5`` == DuckDB ``md5``, and the affine
    transform is exact int64 arithmetic (a,h < 2^31 so a*h+b < 2^63).
    Docs with fewer than n tokens produce no shingles and are dropped,
    exactly like the explode path."""
    import hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    A = np.array([a for a, _ in MINHASH_PARAMS], dtype=np.int64)[:, None]
    B = np.array([b for _, b in MINHASH_PARAMS], dtype=np.int64)[:, None]

    def sig(texts):
        # md5 memo: shingles repeat heavily across documents (natural
        # corpora follow Zipf; the hash of a shingle is pure), so one
        # digest per DISTINCT shingle per batch instead of per
        # occurrence — identical results, ~5× fewer md5 calls.
        memo: dict[str, int] = {}

        def h(s: str) -> int:
            v = memo.get(s)
            if v is None:
                v = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % HASH_MOD
                memo[s] = v
            return v

        out = []
        for t in texts:
            toks = t.split(" ")
            shingles = {
                " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
            }
            if not shingles:
                out.append(None)
                continue
            hs = np.array([h(s) for s in shingles], dtype=np.int64)[None, :]
            out.append(((A * hs + B) % HASH_MOD).min(axis=1).tolist())
        return pd.Series(out)

    sig.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    sig_udf = pandas_udf(sig, "array<long>")

    sigs = (
        spread_for_compute(df)
        .select("doc_id", sig_udf(F.col(text_col)).alias("__sig"))
        .filter(F.col("__sig").isNotNull())
    )
    return sigs.select(
        "doc_id",
        *[
            F.element_at(F.col("__sig"), i + 1).alias(f"h{i}")
            for i in range(NUM_HASHES)
        ],
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    portable: bool = True,
    n: int = 3,
    vectorized: bool = True,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH over minhash signatures,
    scored by estimated Jaccard (fraction of matching components).

    Bucket join: band-key = (band index, the band's r signature values);
    docs collide only when an entire band matches. The pair join is
    per-bucket — near-linear instead of O(n²).

    ``vectorized`` (portable path only) builds signatures in an
    Arrow-batched UDF — bit-identical, but a narrow map instead of the
    shingle-explode shuffle; the interpreted form remains the semantic
    twin."""
    sigs = (
        minhash_signatures_vectorized(df, text_col, n)
        if vectorized and portable
        else minhash_signatures(df, text_col, portable, n)
    ).cache()
    sig_cols = [f"h{i}" for i in range(NUM_HASHES)]

    # One scan: explode an array of the b band keys per doc, rather than
    # unioning b selects (which re-reads the signature table b times).
    band_keys = F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(bi)),
                *sig_cols[bi * LSH_ROWS : (bi + 1) * LSH_ROWS],
            )
            for bi in range(LSH_BANDS)
        ]
    )
    all_bands = sigs.select("doc_id", F.explode(band_keys).alias("band_key"))

    a = all_bands.alias("a")
    b = all_bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
        )
        .distinct()
    )

    sa = sigs.select(
        F.col("doc_id").alias("doc_id_1"),
        *[F.col(c).alias(f"a_{c}") for c in sig_cols],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_id_2"),
        *[F.col(c).alias(f"b_{c}") for c in sig_cols],
    )
    matches = sum(
        F.when(F.col(f"a_{c}") == F.col(f"b_{c}"), 1).otherwise(0)
        for c in sig_cols
    )
    return (
        candidates.join(sa, "doc_id_1")
        .join(sb, "doc_id_2")
        .withColumn(
            "est_jaccard", F.round(matches / F.lit(NUM_HASHES), 6)
        )
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_id_1", "doc_id_2", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_fingerprints(
    df: DataFrame, text_col: str = "text", portable: bool = True
) -> DataFrame:
    """60-bit SimHash per document: token-frequency-weighted bit votes.

    Explode tokens → per-token hash → 60 conditional SUM aggregates
    (one per bit, +w if set, −w otherwise) → reassemble the fingerprint
    as Σ (vote_b > 0) << b. Single shuffle (the groupBy), all codegen."""
    from .text import portable_hash60

    tok = spread_for_compute(df).select(
        "doc_id", F.explode(tokens(text_col)).alias("token")
    )
    weighted = tok.groupBy("doc_id", "token").agg(F.count("*").alias("w"))
    token_hash = (
        portable_hash60(F.col("token"))
        if portable
        else F.pmod(F.xxhash64(F.col("token")), F.lit(1 << SIMHASH_BITS))
    )
    hashed = weighted.withColumn("__th", token_hash)
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("__th"), b).bitwiseAND(F.lit(1)) == 1,
                    F.col("w"),
                ).otherwise(-F.col("w"))
            ).alias(f"v{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fp = term if fp is None else fp + term
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 8,
    portable: bool = True,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ d, via the banded-chunk
    trick: split the 60-bit fingerprint into 4 × 15-bit chunks; any pair
    within Hamming ≤ 3·15 must agree on ≥1 chunk (pigeonhole when
    d < chunks) — candidates come from chunk-equality buckets only."""
    fps = simhash_fingerprints(df, text_col, portable).cache()
    chunk_mask = (1 << SIMHASH_CHUNK_BITS) - 1
    # One scan: explode the 4 chunk keys per fingerprint (same
    # single-pass shape as the minhash banding above).
    chunk_keys = F.array(
        *[
            F.concat_ws(
                "-",
                F.lit(str(ci)),
                F.shiftright(F.col("simhash"), ci * SIMHASH_CHUNK_BITS)
                .bitwiseAND(F.lit(chunk_mask))
                .cast("string"),
            )
            for ci in range(SIMHASH_CHUNKS)
        ]
    )
    chunks = fps.select(
        "doc_id", "simhash", F.explode(chunk_keys).alias("chunk_key")
    )

    a = chunks.alias("a")
    b = chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_key") == F.col("b.chunk_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_1"),
            F.col("b.doc_id").alias("doc_id_2"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)  # prune before the dedupe shuffle
        .distinct()
    )


# ---------------------------------------------------------------------------
# Inter-document duplicated-span coverage
# ---------------------------------------------------------------------------

def duplicated_span_coverage(
    df: DataFrame, text_col: str = "text", k: int = 8
) -> DataFrame:
    """Per-document fraction of tokens covered by some k-token span that
    also appears verbatim in at least one OTHER document — the
    repeated-substring dedup signal ("ExactSubstr"-style, re-expressed
    as relational ops instead of a suffix array; intra-document
    repetition is deliberately excluded — that is repetition_ratio's
    job).

    Plan shape / scale notes:
    1. explode each doc into (start, k-gram) windows — narrow, no
       shuffle;
    2. groupBy the 64-bit span hash with countDistinct(doc_id) >= 2 —
       one shuffle on an 8-byte key, never on the span string;
    3. left-semi join the spans against the duplicated keys (AQE
       broadcasts the dup-key set when it is small);
    4. per-doc interval-union sweep: window ordered by span start with
       a running max of span end — partitioned by doc_id, state bounded
       by document length, no global window anywhere.
    """
    toks = df.select("doc_id", tokens(text_col).alias("__t")).withColumn(
        "n_tokens", F.array_size("__t").cast("long")
    )
    spans = (
        toks.filter(F.col("n_tokens") >= k)
        .select(
            "doc_id",
            "n_tokens",
            "__t",
            F.explode(
                F.sequence(F.lit(1), (F.col("n_tokens") - k + 1).cast("int"))
            ).alias("s"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "s",
            F.xxhash64(
                F.array_join(F.slice("__t", F.col("s"), k), " ")
            ).alias("__h"),
        )
    )
    dup_keys = (
        spans.groupBy("__h")
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select("__h")
    )
    hits = spans.join(dup_keys, "__h", "left_semi").select(
        "doc_id", "n_tokens", "s", (F.col("s") + k - 1).alias("e")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = hits.withColumn("__pe", F.max("e").over(w)).withColumn(
        "__contrib",
        F.greatest(
            F.lit(0),
            F.col("e")
            - F.greatest(F.col("s") - 1, F.coalesce("__pe", F.lit(0))),
        ).cast("long"),
    )
    return (
        swept.groupBy("doc_id")
        .agg(
            F.first("n_tokens").alias("n_tokens"),
            F.sum("__contrib").alias("n_dup_tokens"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_dup_tokens",
            F.round(F.col("n_dup_tokens") / F.col("n_tokens"), 6).alias(
                "dup_fraction"
            ),
        )
    )


def salted_block_pairs(
    df: DataFrame,
    key_cols: list[str],
    n_salts: int = 8,
    id_col: str = "__id",
) -> DataFrame:
    """Every unordered intra-key row pair EXACTLY ONCE, with the key
    group split into ``n_salts·(n_salts+1)/2`` sub-block join groups.

    A blocked linkage join (same-key candidate pairs verified by a
    per-pair residual, e.g. Levenshtein) has a skew failure mode the
    100× sweep demonstrated on d69: a hot block is a single join-key
    group, so its |block|² residual work runs as ONE task — neither
    AQE skew-join (which splits partitions, not key groups) nor more
    executors can break it up. Salting each row by ``hash(id) %
    n_salts`` and enumerating sub-block PAIRS (the per-block form of
    ``similarity.near_duplicate_pairs_blocked``'s global scheme)
    splits that group's work ~n_salts² ways at the cost of shipping
    each row n_salts+1 times.

    Pair {x, y} with salts (px ≤ py) meets exactly once under key
    (key, ka=px, kb=py): the left leg carries each row at (p, q) for
    q ∈ [p, n_salts-1], the right leg at (q, p) for q ∈ [0, p]; the
    diagonal (ka = kb) would see both orientations, so it keeps only
    ``left.id < right.id``. Salt choice moves pairs BETWEEN tasks,
    never changes the pair set — xxhash64 portability is irrelevant
    (contrast band membership in the LSH ops, which is contractual).

    Returns one row per pair with two struct columns ``a`` and ``b``
    (the full input row minus the salt legs); callers project and
    apply their residual.  ``id_col`` must be unique per row.
    """
    cols = df.columns
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).cast("int")
    )
    left = salted.select(
        F.col("__salt").alias("__ka"),
        F.explode(F.sequence(F.col("__salt"), F.lit(n_salts - 1))).alias("__kb"),
        F.struct(*cols).alias("a"),
    )
    right = salted.select(
        F.explode(F.sequence(F.lit(0), F.col("__salt"))).alias("__ka2"),
        F.col("__salt").alias("__kb2"),
        F.struct(*cols).alias("b"),
    )
    cond = (F.col("__ka") == F.col("__ka2")) & (
        F.col("__kb") == F.col("__kb2")
    )
    for k in key_cols:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return (
        left.join(right, cond)
        .filter(
            (F.col("__ka") != F.col("__kb"))
            | (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        )
        .select("a", "b")
    )
