"""Wave 49 — python-model replays for d182–d184 (conditional entropy,
term burstiness, MMR diversified top-k)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave49

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").collect()


# ---------------------------------------------------------------------------
# d182 — conditional entropy
# ---------------------------------------------------------------------------
def test_d182_matches_python_replay(spark):
    uni: dict = defaultdict(Counter)
    bi: dict = defaultdict(Counter)
    for r in _docs(spark):
        ws = r.text.split(" ")
        uni[r.source].update(ws)
        bi[r.source].update(zip(ws, ws[1:]))
    out = _rows(spark, "d182_conditional_entropy")
    assert {r.source for r in out} == set(uni)
    for row in out:
        uc, bc = uni[row.source], bi[row.source]
        n = sum(uc.values())
        n2 = sum(bc.values())
        assert (row.n_tokens, row.n_bigrams) == (n, n2)
        h1 = math.log2(n) - sum(c * math.log2(c) for c in uc.values()) / n
        prev = Counter()
        for (x, _), c in bc.items():
            prev[x] += c
        hc = -sum(
            c * math.log2(c / prev[x]) for (x, _), c in bc.items()
        ) / n2
        assert row.h_unigram == pytest.approx(h1, abs=1e-5)
        assert row.h_cond == pytest.approx(hc, abs=1e-5)
        assert row.redundancy == pytest.approx(
            round(1.0 - row.h_cond / row.h_unigram, 6), abs=1e-9
        )
        # conditioning never increases entropy (MLE, same corpus)
        assert row.h_cond <= row.h_unigram + 1e-9


# ---------------------------------------------------------------------------
# d183 — term burstiness
# ---------------------------------------------------------------------------
def test_d183_matches_python_replay(spark):
    per_doc: dict = defaultdict(lambda: defaultdict(Counter))
    n_docs: Counter = Counter()
    for r in _docs(spark):
        n_docs[r.source] += 1
        per_doc[r.source][r.doc_id].update(r.text.split(" "))

    out = _rows(spark, "d183_term_burstiness")
    by_source: dict = defaultdict(list)
    for row in out:
        by_source[row.source].append(row)
    for source, rows in by_source.items():
        docs = per_doc[source]
        n = n_docs[source]
        stats: dict = {}
        for cnts in docs.values():
            for w, c in cnts.items():
                df, tot, s2 = stats.get(w, (0, 0, 0))
                stats[w] = (df + 1, tot + c, s2 + c * c)
        top = sorted(stats.items(), key=lambda kv: (-kv[1][0], kv[0]))[
            : wave49._BURST_TOPK
        ]
        assert [r.term for r in rows] == [w for w, _ in top]
        for row, (w, (df, tot, s2)) in zip(rows, top):
            assert (row.df, row.total_n) == (df, tot)
            mean = tot / n
            var = (s2 - tot * tot / n) / (n - 1)
            assert row.burstiness == pytest.approx(
                round(var / mean, 6), abs=1e-9
            )
        assert [r.term_rank for r in rows] == list(
            range(1, len(rows) + 1)
        )


# ---------------------------------------------------------------------------
# d184 — MMR diversified top-k
# ---------------------------------------------------------------------------
def _py_cos(a, b) -> float:
    dot = na = nb = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
        na += float(x) * float(x)
        nb += float(y) * float(y)
    return round(dot / (math.sqrt(na) * math.sqrt(nb)), 6)


def test_d184_matches_python_greedy(spark):
    embs = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    out = _rows(spark, "d184_mmr_topk")
    by_q: dict = defaultdict(list)
    for row in out:
        by_q[row.query_id].append(row)
    assert set(by_q) == set(range(wave49._MMR_NQ))
    for q, rows in by_q.items():
        rel = {
            n: _py_cos(embs[q], embs[n]) for n in embs if n != q
        }
        pool = sorted(rel, key=lambda n: (-rel[n], n))[: wave49._MMR_POOL]
        rel6 = {n: round(rel[n] * 1e6) for n in pool}
        sim6 = {
            (a, b): round(_py_cos(embs[a], embs[b]) * 1e6)
            for a in pool
            for b in pool
            if a != b
        }
        sel: list = []
        for r in range(1, wave49._MMR_K + 1):
            best = None
            for n in pool:
                if n in sel:
                    continue
                ms = max((sim6[(n, s)] for s in sel), default=None)
                score = (
                    7 * rel6[n]
                    if ms is None
                    else 7 * rel6[n] - 3 * ms
                )
                if best is None or (score, -n) > (best[1], -best[0]):
                    best = (n, score)
            sel.append(best[0])
            row = rows[r - 1]
            assert (row.pick_rank, row.neighbor_id) == (r, best[0])
            assert row.mmr_score_e7 == best[1]
            assert row.mmr_score == pytest.approx(
                best[1] / 1e7, abs=1e-12
            )
    # diversification sanity: picks are distinct and rank-1 is the
    # relevance argmax
    for q, rows in by_q.items():
        ids = [r.neighbor_id for r in rows]
        assert len(set(ids)) == len(ids)
