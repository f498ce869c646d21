"""Wave 41 — URL/domain curation operators (d157–d161).

Operator-level edge cases (the synthetic corpus can't hit them all),
determinism of the frequency cap, anti-join NULL semantics, and the
physical-plan guarantees the docstrings promise (WindowGroupLimit
partial rank-limit; broadcast LEFT ANTI for the blocklist)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kaggle_data_pipeline_with_aws_spark.operators import domains


def _hosts(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.host
        for r in df.select(domains.url_host(F.col("url")).alias("host"))
        .collect()
    ]


def test_url_host_edges(spark):
    urls = [
        "https://www.Example.COM/path?q=1",  # case + path
        "http://u:p@blog.site.co.uk:8443/d/5",  # userinfo + port
        "https://host.org.",  # trailing dot
        "ftp://files.example.net/x",  # any scheme works
        "no-scheme.example.com/path",  # no scheme -> NULL
        "https:///missing-host",  # empty authority -> NULL
    ]
    assert _hosts(spark, urls) == [
        "www.example.com",
        "blog.site.co.uk",
        "host.org",
        "files.example.net",
        None,
        None,
    ]


def test_url_host_null_input(spark):
    df = spark.createDataFrame([(None,)], "url string")
    assert df.select(
        domains.url_host(F.col("url")).alias("h")
    ).collect()[0].h is None


def _domains_of(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [
        r.d
        for r in df.select(
            domains.registrable_domain(F.col("host")).alias("d")
        ).collect()
    ]


def test_registrable_domain_edges(spark):
    hosts = [
        "cdn.static.site1.co.uk",  # deep subdomain, 2-label suffix
        "site1.co.uk",  # exactly eTLD+1 (2-label suffix)
        "co.uk",  # bare public suffix -> NULL
        "www.example.com",  # subdomain, 1-label suffix
        "example.com",  # exactly eTLD+1
        "com",  # bare 1-label suffix -> NULL
        "localhost",  # matches no suffix -> NULL
        "foo.uk",  # 'uk' is a suffix in the subset
        "a.b.example.org",  # two subdomain levels
    ]
    assert _domains_of(spark, hosts) == [
        "site1.co.uk",
        "site1.co.uk",
        None,
        "example.com",
        "example.com",
        None,
        None,
        "foo.uk",
        "example.org",
    ]


def test_spark_and_sql_twins_agree(spark):
    """The DuckDB twins produce byte-identical host/domain values over
    every edge shape (the oracle contract)."""
    import duckdb

    urls = [
        "https://www.Example.COM/path",
        "http://u:p@CDN.Static.site1.CO.UK:8443/d/5",
        "https://host.org.",
        "https://co.uk/x",
        "https://localhost:9000/",
        "bare-string",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [
        (r.h, r.d)
        for r in df.select(
            domains.url_host(F.col("url")).alias("h"),
            domains.registrable_domain(
                domains.url_host(F.col("url"))
            ).alias("d"),
        ).collect()
    ]
    con = duckdb.connect()
    host_sql = domains.url_host_sql("url")
    got_sql = []
    for u in urls:
        got_sql.append(
            con.execute(
                f"SELECT {host_sql} AS h, "
                f"{domains.registrable_domain_sql(host_sql)} AS d "
                f"FROM (SELECT '{u}' AS url) t"
            ).fetchone()
        )
    assert got_spark == [tuple(x) for x in got_sql]


def test_cap_per_domain_deterministic_and_bounded(spark):
    rows = [(i, f"dom{i % 3}.com") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept1 = sorted(
        (r.domain, r.doc_id)
        for r in domains.cap_per_domain(df, "domain", "doc_id", 4).collect()
    )
    kept2 = sorted(
        (r.domain, r.doc_id)
        for r in domains.cap_per_domain(
            df.repartition(7), "domain", "doc_id", 4
        ).collect()
    )
    assert kept1 == kept2, "cap selection depends on partitioning"
    per_dom: dict[str, int] = {}
    for dom, _ in kept1:
        per_dom[dom] = per_dom.get(dom, 0) + 1
    assert all(v == 4 for v in per_dom.values())
    # python replay of the salted-hash ranking picks the same rows
    def h(i: int) -> int:
        return (
            int(hashlib.md5(f"cap|{i}".encode()).hexdigest()[:15], 16)
            % 2_147_483_647
        )

    expect = set()
    for d in range(3):
        ids = sorted(
            (i for i in range(40) if i % 3 == d),
            key=lambda i: (h(i), i),
        )[:4]
        expect.update((f"dom{d}.com", i) for i in ids)
    assert set(kept1) == expect


def test_blocklist_screen_keeps_null_domains(spark):
    df = spark.createDataFrame(
        [(1, "bad.com"), (2, "good.com"), (3, None)],
        "doc_id long, domain string",
    )
    blocked = spark.createDataFrame([("bad.com",)], "domain string")
    kept = sorted(
        r.doc_id
        for r in domains.blocklist_screen(df, "domain", blocked).collect()
    )
    assert kept == [2, 3]


def test_d158_plan_has_partial_window_group_limit(spark):
    """The cap's row_number <= k predicate must compile to a Partial
    WindowGroupLimit (rank limit applied map-side before the shuffle)
    — the operator's 100x-scale guarantee."""
    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["d158_domain_frequency_cap"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_d159_plan_broadcasts_blocklist_anti_join(spark):
    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    df = registry.QUERIES["d159_domain_blocklist_screen"](
        spark, "/root/testdata/sf0.001"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_d161_rows_bounded_by_domains(spark):
    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["d161_domain_skew_profile"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert 0 < len(rows) <= 13 * 8
    assert rows[0].dom_rank == 1
    assert abs(rows[-1].cum_share - 1.0) < 1e-6
    shares = [r.share for r in rows]
    assert shares == sorted(shares, reverse=True)


def test_url_path_edges(spark):
    from pyspark.sql import functions as F

    urls = [
        "https://a.com/s1/d/5?q=1#frag",  # query+fragment stripped
        "https://a.com",  # no path -> NULL
        "http://u:p@b.co.uk:8443/s0/d/2",  # userinfo+port ignored
        "no-scheme/s1/x",  # no scheme -> NULL
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.p
        for r in df.select(domains.url_path(F.col("url")).alias("p"))
        .collect()
    ]
    assert got == ["/s1/d/5", None, "/s0/d/2", None]


def test_path_rule_screen_semantics(spark):
    from pyspark.sql import functions as F  # noqa: F401

    df = spark.createDataFrame(
        [
            (1, "a.com", "/s0/d/1"),
            (2, "a.com", "/s1/d/2"),
            (3, "b.com", "/s0/d/3"),  # rule is for a.com only
            (4, "a.com", None),  # NULL path matches nothing
            (5, None, "/s0/d/5"),  # NULL domain matches nothing
        ],
        "doc_id long, domain string, path string",
    )
    rules = spark.createDataFrame(
        [("a.com", "/s0/")], "rule_domain string, path_prefix string"
    )
    kept = sorted(
        r.doc_id
        for r in domains.path_rule_screen(
            df, "domain", "path", rules
        ).collect()
    )
    assert kept == [2, 3, 4, 5]


def test_d171_rule_screen_blocks_only_ruled_sections(spark):
    from kaggle_data_pipeline_with_aws_spark.plans import registry
    from kaggle_data_pipeline_with_aws_spark.plans.wave41 import domain_map
    from kaggle_data_pipeline_with_aws_spark.plans.wave46 import _PATH_RULES

    registry.load_all()
    rows = registry.QUERIES["d171_path_rule_screen"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    ruled = {d for d, _ in _PATH_RULES}
    for r in rows:
        if r.domain not in ruled:
            assert r.n_blocked == 0
        assert r.n_kept + r.n_blocked == r.n_docs
    # python replay of the blocked counts
    dm = domain_map(spark, "/root/testdata/sf0.001").collect()
    rules = dict(_PATH_RULES)
    expect_blocked: dict[str, int] = {}
    for row in dm:
        pre = rules.get(row.domain)
        if pre and row.path.startswith(pre):
            expect_blocked[row.domain] = (
                expect_blocked.get(row.domain, 0) + 1
            )
    got_blocked = {r.domain: r.n_blocked for r in rows if r.n_blocked}
    assert got_blocked == expect_blocked
