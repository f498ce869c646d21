"""URL/domain-level curation operators (the C4/RefinedWeb staple).

Host extraction, registrable-domain resolution against a public-suffix
rule set, per-domain frequency caps, and domain blocklist screens —
the curation layer every large-scale web-text pipeline applies before
any content-level filter, because domains are THE heavy-hitter key of
web corpora (a handful of hosts contribute most documents).

Engine discipline:

- **Pure column expressions.** Host/domain extraction is regex +
  array surgery on strings — all ``pyspark.sql.functions``, fully
  inside whole-stage codegen; never a Python UDF. Every helper has a
  DuckDB SQL twin so oracle queries reproduce values bit-for-bit.
- **Public-suffix list as data.** The embedded ``PSL_2LABEL`` /
  ``PSL_1LABEL`` tuples are a deliberately small, versioned subset of
  the public-suffix list sufficient for the synthetic corpus; a
  production deployment passes the full Mozilla PSL (a few thousand
  rows) through the same parameters — the match is longest-suffix
  first, exactly the PSL algorithm for its non-wildcard rules.
- **Cap = WindowGroupLimit, not a full sort.** ``cap_per_domain``'s
  ``row_number() <= k`` predicate compiles to Spark's rank-limit
  pushdown (WindowGroupLimit): each map partition forwards at most k
  rows per domain BEFORE the shuffle, so a hot domain with 10^9
  documents ships k rows per input partition, not its full posting.
- **Blocklist = broadcast anti-join.** Blocklists are dimension-sized
  (thousands of domains); the fact side never shuffles.

Reference scope: the reference pipeline (five pandas/boto3 Lambdas,
see SURVEY.md) has no URL handling — this module is part of the
mandated beyond-reference LLM-data-curation surface.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import portable_hash

# Versioned public-suffix subset (longest match wins, the PSL rule).
# A deployment swaps in the full Mozilla list via the function params.
PSL_2LABEL: tuple[str, ...] = ("co.uk", "ac.uk", "com.au", "co.jp")
PSL_1LABEL: tuple[str, ...] = (
    "com",
    "org",
    "net",
    "io",
    "edu",
    "gov",
    "uk",
    "au",
    "jp",
)

_AUTHORITY_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"


def url_host(url: Column) -> Column:
    """Canonical host of a scheme-prefixed URL: the RFC-3986 authority
    with userinfo and port stripped, lowercased, trailing dot removed.
    NULL for inputs without a ``scheme://`` prefix (and for NULLs)."""
    auth = F.regexp_extract(url, _AUTHORITY_RE, 1)
    no_user = F.element_at(F.split(auth, "@"), -1)
    no_port = F.regexp_replace(no_user, r":[0-9]+$", "")
    return F.nullif(
        F.regexp_replace(F.lower(no_port), r"\.$", ""), F.lit("")
    )


def url_host_sql(expr: str) -> str:
    """DuckDB twin of ``url_host`` (same op order: strip userinfo,
    strip port, lowercase, strip trailing dot, empty→NULL)."""
    auth = (
        f"regexp_extract({expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1)"
    )
    no_user = f"(string_split({auth}, '@'))[-1]"
    no_port = f"regexp_replace({no_user}, ':[0-9]+$', '')"
    return f"nullif(regexp_replace(lower({no_port}), '\\.$', ''), '')"


def url_path(url: Column) -> Column:
    """Path component of a scheme-prefixed URL (from the first ``/``
    after the authority up to ``?``/``#``). NULL for inputs without a
    ``scheme://`` prefix and for empty paths — callers treat NULL as
    "no path to match rules against"."""
    return F.nullif(
        F.regexp_extract(url, _AUTHORITY_RE + r"([^?#]*)", 2), F.lit("")
    )


def url_path_sql(expr: str) -> str:
    """DuckDB twin of ``url_path``."""
    return (
        f"nullif(regexp_extract({expr}, "
        f"'^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1), '')"
    )


def registrable_domain(
    host: Column,
    psl2: Sequence[str] = PSL_2LABEL,
    psl1: Sequence[str] = PSL_1LABEL,
) -> Column:
    """Registrable domain (eTLD+1) of a canonical host: one label more
    than the longest matching public suffix. NULL when the host IS a
    public suffix (nothing registrable) or matches no suffix at all
    (e.g. ``localhost``, IPs) — callers treat NULL as "no domain key".
    """
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # try_element_at + NULL-propagating concat: a host with fewer
    # labels than the probe yields NULL (never an ANSI out-of-bounds
    # error), exactly matching the SQL twin's list[-k] || '.' || …
    last1 = F.try_element_at(labels, F.lit(-1))
    last2 = F.concat(F.try_element_at(labels, F.lit(-2)), F.lit("."), last1)
    last3 = F.concat(F.try_element_at(labels, F.lit(-3)), F.lit("."), last2)
    return F.when((n >= 3) & last2.isin(*psl2), last3).when(
        (n >= 2) & last1.isin(*psl1) & ~last2.isin(*psl2), last2
    )


def registrable_domain_sql(
    host_expr: str,
    psl2: Sequence[str] = PSL_2LABEL,
    psl1: Sequence[str] = PSL_1LABEL,
) -> str:
    """DuckDB twin of ``registrable_domain``."""
    labels = f"string_split({host_expr}, '.')"
    s2 = ", ".join(f"'{s}'" for s in psl2)
    s1 = ", ".join(f"'{s}'" for s in psl1)
    last1 = f"({labels})[-1]"
    last2 = f"(({labels})[-2] || '.' || {last1})"
    last3 = f"(({labels})[-3] || '.' || {last2})"
    return (
        f"CASE WHEN len({labels}) >= 3 AND {last2} IN ({s2}) THEN {last3} "
        f"WHEN len({labels}) >= 2 AND {last1} IN ({s1}) "
        f"AND NOT {last2} IN ({s2}) THEN {last2} END"
    )


def cap_per_domain(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain — the per-domain frequency
    cap every web-curation recipe applies so heavy-hitter hosts can't
    dominate the training mix.

    Selection is DETERMINISTIC and content-independent: rows rank by a
    portable salted hash of the key (ties by the key itself), so the
    same corpus keeps the same rows on any engine, any partitioning,
    any retry — and the survivor set is a uniform sample of the
    domain's rows, not a scan-order prefix.

    Scale shape: ``row_number() <= cap`` over the domain window is
    Spark's WindowGroupLimit pattern — the rank limit is evaluated
    map-side per partition before the shuffle, so a hot domain
    contributes at most ``cap`` rows per input partition to the
    exchange instead of its entire posting list."""
    w = Window.partitionBy(domain_col).orderBy(
        portable_hash(
            F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))
        ),
        F.col(key_col),
    )
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .filter(F.col("_cap_rn") <= cap)
        .drop("_cap_rn")
    )


def path_rule_screen(
    df: DataFrame, domain_col: str, path_col: str, rules: DataFrame
) -> DataFrame:
    """Drop rows matching a (domain, path-prefix) exclusion rule —
    the robots/CCNet-style URL filter. ``rules`` carries columns
    ``rule_domain, path_prefix``; a row is dropped when its domain
    equals a rule's domain AND its path starts with the rule's prefix.
    Broadcast LEFT ANTI with an equi key (domain) plus the prefix
    predicate as a residual join condition — the fact side never
    shuffles, and the hash lookup narrows candidates to one domain's
    rules before the startswith check. NULL domains/paths match
    nothing and are kept."""
    cond = (F.col(domain_col) == rules["rule_domain"]) & F.col(
        path_col
    ).startswith(rules["path_prefix"])
    return df.join(F.broadcast(rules), cond, "left_anti")


def blocklist_screen(
    df: DataFrame, domain_col: str, blocked: DataFrame
) -> DataFrame:
    """Drop rows whose registrable domain appears in the blocklist —
    a broadcast LEFT ANTI equi-join (blocklists are dimension-sized;
    the fact side never shuffles). ``blocked`` must carry exactly one
    column named ``domain_col``. Rows with a NULL domain are KEPT
    (anti-join semantics: NULL matches nothing) — screening undecided
    rows is a separate policy choice, not this operator's."""
    return df.join(F.broadcast(blocked), on=domain_col, how="left_anti")


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a scheme-prefixed URL for exact-dup grouping
    (the C4/Common-Crawl URL normalizer): scheme forced to https,
    userinfo and port stripped, host lowercased with a leading
    ``www.`` removed, query string and fragment dropped, trailing
    slash trimmed. NULL for inputs without a host (no canonical key
    to group on). ``m.``-style mobile hosts are deliberately KEPT
    distinct — collapsing those is a site-specific policy, not a
    lossless normalization."""
    host = F.regexp_replace(url_host(url), r"^www\.", "")
    path = F.regexp_replace(F.coalesce(url_path(url), F.lit("")), r"/+$", "")
    return F.concat(F.lit("https://"), host, path)


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB twin of ``canonicalize_url`` (same op order)."""
    host = f"regexp_replace({url_host_sql(expr)}, '^www\\.', '')"
    path = (
        f"regexp_replace(coalesce({url_path_sql(expr)}, ''), '/+$', '')"
    )
    return f"('https://' || {host} || {path})"
