"""Round-8 wave 42 — the iterated BPE training fixpoint:

- d162 — BPE trainer, 8 bounded rounds: extends d74's single
  merge-candidate round (``plans/wave6.py:353``) into the actual
  training loop — per round, count adjacent symbol pairs over the
  word-type histogram, pick the winner deterministically, re-segment
  every word with a greedy left-to-right merge, and emit the merge
  table (the artifact a tokenizer ships).

The oracle unrolls the loop: one CTE block per round (adjacency via
``lead``, MATERIALIZED winner, run-parity greedy merge, re-numbered
segmentation) — the same algorithm the Spark operator executes, stated
in plain window SQL. Greedy-overlap note: adjacent occurrences of the
winning pair overlap only when left == right; greedy pairing within a
run of identical symbols merges exactly the even run offsets, which is
what both engines compute (no sequential fold anywhere).

Reference scope: beyond-reference LLM-data-curation surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import bpe
from ..sources.readers import load_table
from .registry import spark_query

_ROUNDS = 8


def _round_cte(r: int, materialize_seg: bool = False) -> str:
    """CTE block for round r: seg{r-1} -> adj{r}, best{r}, seg{r}.

    ``materialize_seg``: d167 references each seg{r} twice (the next
    round AND the per-round token aggregate), so ITS chain marks seg
    AS MATERIALIZED per the ≥2-references rule; d162 references each
    seg once and keeps the plain form."""
    seg_kw = "MATERIALIZED " if materialize_seg else ""
    return f"""
    adj{r} AS MATERIALIZED (
      SELECT word, w, pos, sym,
             lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nsym
      FROM seg{r - 1}
    ),
    best{r} AS MATERIALIZED (
      SELECT sym AS lsym, nsym AS rsym, CAST(sum(w) AS BIGINT) AS n
      FROM adj{r} WHERE nsym IS NOT NULL
      GROUP BY 1, 2
      ORDER BY n DESC, lsym, rsym LIMIT 1
    ),
    st{r} AS (
      SELECT word, w, pos, sym, lsym, rsym,
             adjm AND (lsym <> rsym OR
               (row_number() OVER (PARTITION BY word, grp ORDER BY pos)
                - 1) % 2 = 0) AS ms
      FROM (
        SELECT a.word, a.w, a.pos, a.sym, b.lsym, b.rsym,
               (a.sym = b.lsym AND coalesce(a.nsym = b.rsym, FALSE))
                 AS adjm,
               CASE WHEN a.sym = b.lsym THEN a.pos - row_number()
                    OVER (PARTITION BY a.word, (a.sym = b.lsym)
                          ORDER BY a.pos) END AS grp
        FROM adj{r} a CROSS JOIN best{r} b
      )
    ),
    seg{r} AS {seg_kw}(
      SELECT word, w,
             CAST(row_number() OVER (PARTITION BY word ORDER BY pos)
                  AS BIGINT) AS pos,
             CASE WHEN ms THEN lsym || rsym ELSE sym END AS sym
      FROM (
        SELECT *, coalesce(lag(ms) OVER (PARTITION BY word
                   ORDER BY pos), FALSE) AS consumed
        FROM st{r}
      )
      WHERE NOT consumed
    )"""


def _wt_seg0(materialize_seg0: bool = False) -> str:
    """Shared oracle prefix: word-type histogram + round-0 (1-char)
    segmentation. d167 references seg0 twice → MATERIALIZED there."""
    seg_kw = "MATERIALIZED " if materialize_seg0 else ""
    return f"""WITH wt AS MATERIALIZED (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS w
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE len(t) >= 1
      GROUP BY 1
    ),
    seg0 AS {seg_kw}(
      SELECT word, w,
             CAST(unnest(range(1, len(word) + 1)) AS BIGINT) AS pos,
             substr(word, CAST(unnest(range(1, len(word) + 1)) AS INT), 1)
               AS sym
      FROM wt
    ),"""


def _d162_oracle() -> str:
    blocks = ",".join(_round_cte(r) for r in range(1, _ROUNDS + 1))
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, lsym AS left_sym, "
        f"rsym AS right_sym, n AS pair_count, lsym || rsym AS merged "
        f"FROM best{r}"
        for r in range(1, _ROUNDS + 1)
    )
    return f"""{_wt_seg0()}{blocks}
    SELECT * FROM ({finals})
    ORDER BY round
    """


def _d167_oracle() -> str:
    blocks = ",".join(
        _round_cte(r, materialize_seg=True) for r in range(1, _ROUNDS + 1)
    )
    per_round = "\n      UNION ALL\n      ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"CAST(sum(w) AS BIGINT) AS corpus_tokens FROM seg{r}"
        for r in range(0, _ROUNDS + 1)
    )
    return f"""{_wt_seg0(materialize_seg0=True)}{blocks},
    rt AS MATERIALIZED (
      {per_round}
    ),
    nw AS (SELECT sum(w) AS n_words FROM wt),
    t0 AS (SELECT corpus_tokens AS tok0 FROM rt WHERE round = 0)
    SELECT round, corpus_tokens,
           round(CAST(corpus_tokens AS DOUBLE) / n_words, 6)
             AS tokens_per_word,
           round(CAST(corpus_tokens AS DOUBLE) / tok0, 6) AS compression
    FROM rt, nw, t0
    ORDER BY round
    """


@spark_query("d167_bpe_encode_stats", _d167_oracle())
def d167_bpe_encode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The encode side of the d162 trainer: per round 0..8, the corpus
    token count under that round's merge table, tokens-per-word, and
    the compression ratio vs the character baseline — the curve that
    tells a tokenizer build when additional merges stop paying. Each
    per-round total is a 1-row aggregate of the vocab-sized
    segmentation (Σ word-count × symbols); the corpus is touched once
    (the word-type histogram)."""
    return bpe.encode_stats(
        load_table(spark, sf_dir, "documents"), _ROUNDS
    )


@spark_query("d162_bpe_train", _d162_oracle())
def d162_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-round BPE training over the documents corpus: the merge table
    (round, left_sym, right_sym, pair_count, merged). The corpus
    collapses to its word-type histogram in one bounded shuffle; every
    round after that is a row-local pair explode into one partial-
    aggregated integer-sum shuffle (the winner a 1-row fence) and a
    row-local greedy-merge fold over the array segmentation with a
    per-round localCheckpoint — no window exchanges, no UDF (see
    ``operators/bpe.py``; round-11 rework)."""
    return bpe.bpe_train(load_table(spark, sf_dir, "documents"), _ROUNDS)
