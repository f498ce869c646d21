"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2 (+ the
LLM-data extensions), one named plan each.
``oracle_sql()`` — DuckDB twins for the correctness harness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kaggle_data_pipeline_with_aws_spark.plans import registry

registry.load_all()

SF0001 = "/root/testdata/sf0.001"

# Extra bench-headline ops (bench.py appends these to HEADLINE): the
# exact set-similarity PPJoins — the repo's biggest plan-level perf
# work — so BENCH_r{N}.json carries their time series going forward.
BENCH_EXTRA = [
    "d06_ngram_jaccard",
    "d42_shingle_containment",
    "d110_semdedup",
    # added round 5 after its in-task pair-kernel rewrite (182→9.7 s
    # at 10×) so the series tracks the flagship embedding-pair op
    "d10_embedding_neardup",
    # added round 6 with the shared ranked-shingle substrate — its
    # loosest-threshold PPJoin pass was the family's biggest win
    # (30.1→5.9 s at 10×); the series tracks the substrate economics
    "d126_dedup_threshold_sweep",
    # added round 7 when d15 gained the deterministic fitted quantizer
    # and a full value oracle (the registry's last rows-only check) —
    # the series tracks the flagship ANN serving path
    "d15_ann_ivf",
    # added round 8 with the URL/domain curation family: d158 is the
    # WindowGroupLimit frequency cap over the published domain-map
    # substrate, d162 the iterated BPE trainer — the series tracks
    # the two new tiers' economics
    "d158_domain_frequency_cap",
    "d162_bpe_train",
    # added late round 8 with the sketch/serving tiers: d174 is the
    # explicit-register HLL build (the mergeable-sketch substrate of
    # d178/d181/d187/s14), d198 the Matryoshka coarse-to-fine rerank —
    # the series tracks both tiers' economics going forward
    "d174_hll_cardinality",
    "d198_progressive_rerank",
    # added round 9 with the tokenizer-EM and graph-serving tiers:
    # d202 is the unigram-LM EM trainer (the likelihood half of the
    # tokenizer story), d204 the NSW beam search over the kNN
    # substrate — the series tracks both tiers' economics
    "d202_unigram_train",
    "d204_nsw_beam_search",
    # added round 10: d208 is the beam search over the
    # connectivity-augmented substrate (the recall-recovered serving
    # face), d210 the unigram Viterbi encode at the raised W=12/L=6
    # lattice — the series tracks the serving tier and the wider
    # lattice's cost going forward
    "d208_nsw_augmented_search",
    "d210_unigram_viterbi_encode",
]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary over lineitem) on sf0.001."""
    return registry.QUERIES["q01_pricing_summary"](spark, SF0001)


# The driver's correctness gate checks the FIRST 50 entries of queries()
# in dict order, so ordering is part of the contract. CORRECTNESS_r{N}
# files are cumulative proof, so each round the window holds (a) queries
# whose implementation or oracle changed since their last green row —
# they must re-prove (ENFORCED by tools/proof_audit.py, gate stage 3:
# symbol-level AST diff of each proven query's dependency closure
# against its proof-baseline commit) — and (b) as many
# never-driver-checked queries as fit.
#
# Round-10 window. Leads with the round-10 re-proofs proof_audit
# demands (the transaction log's port to the Hadoop FileSystem API —
# round-9 verdict #1 — stales the whole lakehouse face) and the
# round-10 additions (staged as they land).
_WINDOW_PRIORITY = [
    # ---- (A) re-proofs: operators/txnlog.py rewritten onto the JVM
    # Hadoop FileSystem/FileContext API with an atomic rename-NONE
    # commit (round-9 verdict #1 + the ADVICE empty-file-window fix);
    # row_diff now reads both snapshots merge-schema'd; the staged
    # tables clean up at exit. Same values, new I/O substrate.
    "q114_snapshot_time_travel",
    "q115_version_incremental_read",
    "q116_version_row_diff",
    "q117_compaction_invariance",
    "q118_versioned_schema_evolution",
    "q119_versioned_merge",
    # ---- (B) round-10 additions (staged as they land) ----
    # wave 63: connectivity-augmented graph ANN (round-9 verdict #2) —
    # the NSW/HNSW build discipline (per-node top-20, bidirectional,
    # never mutual-filtered) closes d205's 0.2-recall fragmentation;
    # d209 is the audit row proving recall@5 ≥ 0.8.
    "d208_nsw_augmented_search",
    "d209_nsw_augmented_recall",
    # wave 64: the lakehouse face's streaming SOURCE side (round-9
    # verdict #3) — the transaction-log CDC tailer drained over the
    # staged table, one micro-batch per committed version; live-log
    # stream-vs-batch equality in tests/test_streaming_cdc.py.
    "s15_txnlog_cdc_batches",
    # wave 65: the unigram tokenizer's serving leg (round-9 verdict
    # #4) — Viterbi encode of the corpus under the trained vocab
    # (exact integer token counts) and the unigram-vs-BPE tokens/char
    # head-to-head on one corpus basis.
    "d210_unigram_viterbi_encode",
    "d211_tokenizer_compression_compare",
    # ---- (C) re-proofs: unigram lattice bounds raised W=8/L=4 →
    # 12/6 after the round-10 width study (round-9 verdict #6; see
    # BENCH_SCALING.md "Unigram lattice width") — trainer values
    # change through the wider candidate space, so the whole family
    # re-proves at the new bounds.
    "d202_unigram_train",
    "d203_unigram_segment_stats",
    "d206_unigram_prune_round",
    # re-proofs: resolve_domains_psl_join gained the deep-rule
    # assert_true guard (round-9 ADVICE — a rule deeper than
    # max_rule_labels now fails loudly instead of silently not
    # resolving). Values unchanged; the dim projection's AST changed.
    "d201_psl_join_resolution",
    "d207_psl_version_drift",
    # wave 66: lakehouse tier 3 — per-file min/max statistics recorded
    # in the log (commit(stats_cols=…)) and data-skipping reads
    # (snapshot_pruned); skip counts AND scanned values oracle-pinned.
    "q120_file_stats_skipping",
    "q121_time_sliced_skipping",
    # q122: log checkpointing (Delta _last_checkpoint) — O(tail)
    # metadata reads, replay plan + value identity oracle-pinned.
    "q122_log_checkpointed_snapshot",
    # wave 67: attribute-filtered ANN — pre-filtered posting lists
    # through the global quantizer, plus the filtered-recall /
    # candidate-selectivity audit.
    "d212_ann_filtered_search",
    "d213_ann_filtered_recall",
]
# Window staging in progress (round 10); the driver checks the first
# 50 of queries() — slots beyond the staged list fall through to
# already-proven oracle-backed queries via _ordered().


def _ordered() -> list[str]:
    missing = [n for n in _WINDOW_PRIORITY if n not in registry.QUERIES]
    assert not missing, f"priority window references unknown queries: {missing}"
    rest_oracle = [
        n
        for n in registry.QUERIES
        if n not in _WINDOW_PRIORITY and n in registry.ORACLE_SQL
    ]
    rest_rows_only = [
        n
        for n in registry.QUERIES
        if n not in _WINDOW_PRIORITY and n not in registry.ORACLE_SQL
    ]
    return [*_WINDOW_PRIORITY, *rest_oracle, *rest_rows_only]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: registry.QUERIES[n] for n in _ordered()}


def oracle_sql() -> dict[str, str]:
    return {
        n: registry.ORACLE_SQL[n] for n in _ordered() if n in registry.ORACLE_SQL
    }
