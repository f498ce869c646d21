"""Wave 57 — python-model replays for d199–d200 (cluster modularity,
Wasserstein drift)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from kaggle_data_pipeline_with_aws_spark.plans import registry, wave57

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


# ---------------------------------------------------------------------------
# d199 — modularity
# ---------------------------------------------------------------------------
def test_d199_matches_python_replay(spark):
    registry.load_all()
    from kaggle_data_pipeline_with_aws_spark.operators import (
        text_substrate,
    )

    pairs = [
        (r.doc_id_1, r.doc_id_2, r.est_jaccard)
        for r in text_substrate.lsh_pairs(
            spark, SF, threshold=wave57._MOD_GRAPH_T
        ).collect()
    ]
    # tight components by union-find
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b, e in pairs:
        if e >= wave57._MOD_CLUSTER_T:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    nodes = {a for a, _, _ in pairs} | {b for _, b, _ in pairs}
    cluster = {
        n: (find(n) if n in parent else n) for n in nodes
    }
    m = len(pairs)
    deg: Counter = Counter()
    for a, b, _ in pairs:
        deg[a] += 1
        deg[b] += 1
    w_in: Counter = Counter()
    for a, b, _ in pairs:
        if cluster[a] == cluster[b]:
            w_in[cluster[a]] += 1
    stats: dict = defaultdict(lambda: [0, 0])
    for n in nodes:
        c = cluster[n]
        stats[c][0] += 1
        stats[c][1] += deg[n]

    out = _rows(spark, "d199_cluster_modularity")
    assert {r.cluster_id for r in out} == set(stats)
    q_total = 0.0
    for row in out:
        n_nodes, d_sum = stats[row.cluster_id]
        assert (row.n_nodes, row.d_sum) == (n_nodes, d_sum)
        assert row.w_in == w_in.get(row.cluster_id, 0)
        qc = (4 * m * row.w_in - d_sum * d_sum) / (4.0 * m * m)
        assert row.q_contrib == pytest.approx(round(qc, 6), abs=1e-9)
        q_total += row.q_contrib
    # modularity is bounded and, with a real near-dup structure,
    # clearly positive
    assert -0.5 <= q_total <= 1.0
    assert q_total > 0.05


# ---------------------------------------------------------------------------
# d200 — 1-D Wasserstein
# ---------------------------------------------------------------------------
def test_d200_matches_python_replay(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    lens: dict = defaultdict(list)
    for r in docs:
        lens[r.source].append(r.n_chars // wave57._W1_BUCKET)
    srcs = sorted(lens)
    out = {(r.src_a, r.src_b): r for r in _rows(spark, "d200_wasserstein_drift")}
    assert set(out) == {
        (a, b) for a in srcs for b in srcs if a < b
    }
    all_buckets = sorted({b for v in lens.values() for b in v})
    for (a, b), row in out.items():
        na, nb = len(lens[a]), len(lens[b])
        assert (row.n_a, row.n_b) == (na, nb)
        ca = Counter(lens[a])
        cb = Counter(lens[b])
        cum_a = cum_b = 0
        d_num = 0
        for i, bk in enumerate(all_buckets):
            cum_a += ca.get(bk, 0)
            cum_b += cb.get(bk, 0)
            span = (
                all_buckets[i + 1] - bk
                if i + 1 < len(all_buckets)
                else 0
            )
            d_num += abs(cum_a * nb - cum_b * na) * span
        w1 = d_num * wave57._W1_BUCKET / (na * nb)
        assert row.w1_chars == pytest.approx(round(w1, 6), abs=1e-9)
        assert row.w1_chars >= 0.0


def test_d200_metric_axioms(spark):
    """W1 is symmetric by construction (pairs stored a<b) and zero
    only for identical distributions — sanity on triangle-ish
    behavior: d(a,c) <= d(a,b) + d(b,c) for the first three
    sources."""
    rows = {(r.src_a, r.src_b): r.w1_chars for r in _rows(spark, "d200_wasserstein_drift")}
    srcs = sorted({a for a, _ in rows} | {b for _, b in rows})[:3]
    a, b, c = srcs

    def d(x, y):
        return rows[(min(x, y), max(x, y))]

    assert d(a, c) <= d(a, b) + d(b, c) + 1e-6
