"""Unit tests for the proof-invalidation audit (tools/proof_audit.py,
gate stage 3): the symbol-reference closure must find real transitive
dependencies at function granularity without degrading module-attribute
references to whole modules."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

import proof_audit as pa  # noqa: E402

from kaggle_data_pipeline_with_aws_spark.plans import registry  # noqa: E402

registry.load_all()

PKG = pa.PKG


def _closure_of(query: str) -> set[tuple[str, str]]:
    graph = _graph()
    fn = registry.QUERIES[query]
    return graph.closure({(fn.__module__, fn.__name__)})


_GRAPH = None


def _graph() -> pa._RefGraph:
    global _GRAPH
    if _GRAPH is None:
        _GRAPH = pa._RefGraph()
    return _GRAPH


def test_closure_finds_transitive_operator_deps():
    deps = _closure_of("d132_bfs_hops")
    names = {s for _, s in deps}
    # plan fn -> bfs_min_hops (operators.components) and the substrate
    # chain retrieval._mutual_knn_edges -> knn_substrate.mutual_knn_edges
    assert "bfs_min_hops" in names
    assert "_mutual_knn_edges" in names
    assert "mutual_knn_edges" in names
    assert "build_edges_plan" in names


def test_closure_is_symbol_precise_not_module_wide():
    """d14 calls dedup.simhash_pairs; the unrelated PPJoin machinery in
    the same module must NOT enter its closure (the round-5 precision
    fix: an Attribute's base Name is not a bare module reference)."""
    deps = _closure_of("d14_simhash_pairs")
    names = {s for m, s in deps if m.endswith("operators.dedup")}
    assert "simhash_pairs" in names
    assert "ngram_jaccard_pairs" not in names
    assert "shingle_containment_pairs" not in names


def test_function_local_imports_count():
    """d82 imports contiguous_row_number inside the function body."""
    deps = _closure_of("d82_perplexity_buckets")
    assert any(s == "contiguous_row_number" for _, s in deps)


def test_docstring_only_changes_do_not_flag():
    import ast

    a = pa._parse('def f():\n    """old doc."""\n    return 1\n', "x.py")
    b = pa._parse('def f():\n    """new doc."""\n    return 1\n', "x.py")
    sa, sb = pa._top_level_symbols(a), pa._top_level_symbols(b)
    assert ast.dump(sa["f"]) == ast.dump(sb["f"])


def test_oracle_sql_is_part_of_the_symbol():
    """The @spark_query decorator argument (the oracle) is inside the
    function's AST, so an oracle edit flags the query."""
    import ast

    src = "@spark_query('q', {sql!r})\ndef f(spark, sf):\n    return 1\n"
    a = pa._parse(src.format(sql="SELECT 1"), "x.py")
    b = pa._parse(src.format(sql="SELECT 2"), "x.py")
    assert ast.dump(pa._top_level_symbols(a)["f"]) != ast.dump(
        pa._top_level_symbols(b)["f"]
    )


def test_changed_symbols_against_a_synthetic_history(tmp_path, monkeypatch):
    """End-to-end git-diff logic on a throwaway repo: only the edited
    function flags; its docstring-only sibling does not; a new symbol
    flags; import changes flag the whole module."""
    import subprocess

    repo = tmp_path / "r"
    pkg = repo / pa.PKG
    pkg.mkdir(parents=True)
    mod = pkg / "m.py"
    mod.write_text(
        "import os\n"
        'def f():\n    """doc."""\n    return 1\n'
        "def g():\n    return 2\n"
    )

    def git(*args):
        subprocess.run(
            ["git", "-C", str(repo), *args], check=True, capture_output=True
        )

    git("init", "-q")
    git("-c", "user.email=t@t", "-c", "user.name=t", "add", "-A")
    git(
        "-c", "user.email=t@t", "-c", "user.name=t",
        "commit", "-q", "-m", "base",
    )
    base = subprocess.run(
        ["git", "-C", str(repo), "rev-parse", "HEAD"],
        check=True, capture_output=True, text=True,
    ).stdout.strip()

    # edit f's body, leave g alone (docstring tweak only), add h
    mod.write_text(
        "import os\n"
        'def f():\n    """doc."""\n    return 99\n'
        'def g():\n    return 2\n'
        "def h():\n    return 3\n"
    )
    monkeypatch.setattr(pa, "ROOT", str(repo))
    graph = pa._RefGraph()
    changed = pa.changed_symbols(base, graph)
    names = {s for _, s in changed}
    assert "f" in names and "h" in names
    assert "g" not in names

    # an import change flags every symbol in the module
    mod.write_text(
        "import sys\n"
        'def f():\n    """doc."""\n    return 99\n'
        "def g():\n    return 2\n"
        "def h():\n    return 3\n"
    )
    graph2 = pa._RefGraph()
    changed2 = pa.changed_symbols(base, graph2)
    assert {s for _, s in changed2} >= {"f", "g", "h"}


def test_audit_is_clean_at_head():
    """Enforced end-state: every stale proof is staged in the window.
    (Same check as gate stage 3 — kept here so plain pytest runs catch
    a drifted window too.)"""
    assert pa.audit() == []
