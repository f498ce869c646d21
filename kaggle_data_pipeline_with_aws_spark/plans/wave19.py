"""Round-4 tenth wave: the packing story completed —

- d117 — materialized packed sequences: d56's next-fit bin
  assignment turned into actual training sequences (ordered
  concatenation with an <eos> separator, content-hashed).
- d118 — packing-efficiency audit: bins, fill utilization, and waste
  per (source, shard) — the number that justifies the capacity
  choice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import next_fit_pack
from ..sources.readers import load_table
from .registry import spark_query
from .retrieval import _PACK_CAP, _PACK_SHARDS, _packing_oracle


def _assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d56's exact bin assignment, with the text carried through."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        (F.col("doc_id") % _PACK_SHARDS).cast("int").alias("shard"),
        "doc_id",
        "n_chars",
        "text",
    )
    return next_fit_pack(
        docs,
        group_cols=["source", "shard"],
        order_col="doc_id",
        size_col="n_chars",
        capacity=_PACK_CAP,
    )


# ---------------------------------------------------------------------------
# d117 — materialized packed sequences.
# ---------------------------------------------------------------------------
@spark_query(
    "d117_packed_sequences",
    _packing_oracle().replace(
        "SELECT source, shard, doc_id, n_chars, bin_id FROM pack",
        """
    SELECT p.source, p.shard, p.bin_id,
           count(*) AS n_docs,
           CAST(sum(p.n_chars) AS BIGINT) AS total_chars,
           md5(string_agg(t.text, '<eos>' ORDER BY p.doc_id))
             AS packed_md5
    FROM pack p JOIN documents t ON p.doc_id = t.doc_id
    GROUP BY 1, 2, 3
    """,
    ),
)
def d117_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training sequences themselves: every (source, shard, bin)
    concatenates its documents in doc_id order with an ``<eos>``
    separator — verified by content hash, so the oracle proves the
    packed BYTES match, not just the assignment. The concat is the
    ordered-listagg idiom (sort_array of (key, text) structs, q97's
    shape) running on the applyInPandas bin assignment; per-group
    state is one sequence's documents, and groups are the parallel
    unit exactly as in d56. The hash (not the sequence) is the
    registered output — at 100 TB the sequences go straight to
    write_training_shards/write_jsonl, and the hash is the loader's
    checksum."""
    packed = F.sort_array(
        F.collect_list(F.struct(F.col("doc_id"), F.col("text")))
    )
    return (
        _assignments(spark, sf_dir)
        .groupBy("source", "shard", "bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.md5(
                F.array_join(
                    F.transform(packed, lambda s: s.getField("text")),
                    "<eos>",
                )
            ).alias("packed_md5"),
        )
    )


# ---------------------------------------------------------------------------
# d118 — packing-efficiency audit.
# ---------------------------------------------------------------------------
@spark_query(
    "d118_packing_efficiency",
    _packing_oracle().replace(
        "SELECT source, shard, doc_id, n_chars, bin_id FROM pack",
        f"""
    , bins AS (
      SELECT source, shard, bin_id, sum(n_chars) AS fill
      FROM pack GROUP BY 1, 2, 3
    )
    SELECT source, shard,
           CAST(count(*) AS BIGINT) AS n_bins,
           CAST(sum(fill) AS BIGINT) AS total_chars,
           CAST(round(CAST(sum(fill) AS DOUBLE)
                / (count(*) * {_PACK_CAP}), 6) AS DOUBLE) AS utilization,
           CAST(sum(CASE WHEN fill > {_PACK_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oversize
    FROM bins GROUP BY 1, 2 ORDER BY 1, 2
    """,
    ),
)
def d118_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Was the capacity right? Per (source, shard): bin count, fill
    utilization against the capacity, and how many bins hold a single
    oversize document (the only legal way a bin exceeds capacity in
    next-fit). Utilization far below 1 says the capacity is too large
    (or the stream should be length-sorted first — compare d68's
    length-bucketed batching); oversize counts say it is too small.
    Derived entirely from the bin-level aggregate of d56's
    assignment — shard-sized output."""
    bins = (
        _assignments(spark, sf_dir)
        .groupBy("source", "shard", "bin_id")
        .agg(F.sum("n_chars").alias("fill"))
    )
    return (
        bins.groupBy("source", "shard")
        .agg(
            F.count("*").alias("n_bins"),
            F.sum("fill").alias("total_chars"),
            F.round(
                F.sum("fill").cast("double")
                / (F.count("*") * F.lit(_PACK_CAP)),
                6,
            ).alias("utilization"),
            F.sum(F.when(F.col("fill") > _PACK_CAP, 1).otherwise(0)).alias(
                "n_oversize"
            ),
        )
        .orderBy("source", "shard")
    )
