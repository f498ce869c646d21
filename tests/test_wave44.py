"""Wave 44 — domain boilerplate + coverage (d168, d169)."""

from __future__ import annotations

from collections import Counter, defaultdict

from kaggle_data_pipeline_with_aws_spark.plans import registry

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    registry.load_all()
    return registry.QUERIES[name](spark, SF).collect()


def test_d168_matches_python_replay(spark):
    """Template-shingle counts and mass replayed in pure python from
    the raw documents + the domain map."""
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import domain_map

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    dm = {
        r.doc_id: r.domain
        for r in domain_map(spark, SF).select("doc_id", "domain").collect()
    }
    dom_docs: dict[str, int] = Counter(dm.values())
    dfd: dict[str, Counter] = defaultdict(Counter)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        sh = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        for s in sh:
            dfd[dm[doc_id]][s] += 1
    expect = {}
    for dom, counter in dfd.items():
        n_docs = dom_docs[dom]
        n_template = sum(
            1 for c in counter.values() if c >= 2 and c * 2 >= n_docs
        )
        t_mass = sum(
            c for c in counter.values() if c >= 2 and c * 2 >= n_docs
        )
        expect[dom] = (
            n_docs,
            len(counter),
            n_template,
            round(t_mass / sum(counter.values()), 6),
        )
    got = {
        r.domain: (r.n_docs, r.n_shingles, r.n_template, r.template_mass)
        for r in _rows(spark, "d168_domain_template_shingles")
    }
    assert got == expect


def test_d169_coverage_curve_invariants(spark):
    rows = _rows(spark, "d169_domain_coverage_curve")
    assert [r.target_share for r in rows] == [0.5, 0.9, 0.99]
    ks = [r.n_domains for r in rows]
    assert ks == sorted(ks)
    for r in rows:
        assert r.covered_share >= r.target_share
    # each k is MINIMAL: k-1 domains cover less than the target
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import domain_map

    counts = sorted(
        Counter(
            r.domain
            for r in domain_map(spark, SF).select("domain").collect()
        ).items(),
        key=lambda kv: (-kv[1], kv[0]),
    )
    total = sum(c for _, c in counts)
    for r in rows:
        if r.n_domains > 1:
            cum_before = sum(c for _, c in counts[: r.n_domains - 1])
            assert cum_before * 100 < r.target_share * 100 * total


def test_d172_mirror_candidates_match_python_replay(spark):
    """Domain-level Jaccard replayed in python over sf0.001 (small
    enough to brute-force) — pins the distinct-set semantics, the
    stop-shingle universe rule, and the threshold filter."""
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import domain_map
    from kaggle_data_pipeline_with_aws_spark.plans.wave46 import (
        _MIRROR_T,
        _STOP_DF,
    )

    docs = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    dm = {
        r.doc_id: r.domain
        for r in domain_map(spark, SF).select("doc_id", "domain").collect()
    }
    sets: dict[str, set] = defaultdict(set)
    for doc_id, text in docs.items():
        toks = text.split(" ")
        sets[dm[doc_id]].update(
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        )
    df_count: Counter = Counter()
    for s in sets.values():
        df_count.update(s)
    stop = {sh for sh, c in df_count.items() if c > _STOP_DF}
    sets = {d: s - stop for d, s in sets.items()}
    expect = set()
    doms = sorted(sets)
    for i, d1 in enumerate(doms):
        for d2 in doms[i + 1 :]:
            nc = len(sets[d1] & sets[d2])
            if nc == 0:
                continue
            j = round(nc / (len(sets[d1]) + len(sets[d2]) - nc), 6)
            if j >= _MIRROR_T:
                expect.add((d1, d2, nc, j))
    got = {
        (r.domain_1, r.domain_2, r.n_common, r.jaccard)
        for r in _rows(spark, "d172_domain_mirror_candidates")
    }
    assert got == expect


def test_d173_funnel_is_monotone_and_capped(spark):
    rows = _rows(spark, "d173_domain_curation_funnel")
    for r in rows:
        assert (
            r.n_total
            >= r.n_after_blocklist
            >= r.n_after_rules
            >= r.n_final
        )
        assert r.n_final <= 3  # _CAP
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import (
        _BLOCKLIST,
    )

    blocked = {r.domain: r for r in rows if r.domain in _BLOCKLIST}
    for r in blocked.values():
        assert r.n_after_blocklist == 0 and r.n_final == 0
