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


def _round_cte(r: int) -> str:
    """CTE block for round r: seg{r-1} -> adj{r}, best{r}, seg{r}."""
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
    seg{r} AS (
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


def _d162_oracle() -> str:
    blocks = ",".join(_round_cte(r) for r in range(1, _ROUNDS + 1))
    finals = "\n    UNION ALL\n    ".join(
        f"SELECT CAST({r} AS BIGINT) AS round, lsym AS left_sym, "
        f"rsym AS right_sym, n AS pair_count, lsym || rsym AS merged "
        f"FROM best{r}"
        for r in range(1, _ROUNDS + 1)
    )
    return f"""WITH wt AS MATERIALIZED (
      SELECT t AS word, CAST(count(*) AS BIGINT) AS w
      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
      WHERE len(t) >= 1
      GROUP BY 1
    ),
    seg0 AS (
      SELECT word, w,
             CAST(unnest(range(1, len(word) + 1)) AS BIGINT) AS pos,
             substr(word, CAST(unnest(range(1, len(word) + 1)) AS INT), 1)
               AS sym
      FROM wt
    ),{blocks}
    SELECT * FROM ({finals})
    ORDER BY round
    """


@spark_query("d162_bpe_train", _d162_oracle())
def d162_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-round BPE training over the documents corpus: the merge table
    (round, left_sym, right_sym, pair_count, merged). The corpus
    collapses to its word-type histogram in one bounded shuffle; every
    round after that is window passes over the vocab-sized
    segmentation table with a broadcast 1-row winner and a per-round
    localCheckpoint — no collect, no UDF, no sequential fold (see
    ``operators/bpe.py``)."""
    return bpe.bpe_train(load_table(spark, sf_dir, "documents"), _ROUNDS)
