"""Proof-invalidation audit (round-4 verdict, "What's wrong" #3).

The driver's correctness proof is cumulative: a query proven green in
round k STAYS proven only while its implementation (and oracle — the
decorator argument, hence part of the plan function's AST) is
unchanged. Any change to code a proven query depends on invalidates the
proof, and the query must re-enter ``__spark_entry__._WINDOW_PRIORITY``
to be re-proven. Round 4 relied on builder memory for this rule; this
tool automates it at SYMBOL granularity (module-level was tried first
and flags half the registry whenever one function in a shared module
changes):

1. Build a static symbol-reference graph over the package: every
   top-level function/class/constant, with edges to the package
   symbols it references (import-aliased names and ``alias.attr``
   module-attribute references both resolve; an unresolvable module
   reference degrades conservatively to "all symbols of that module").
2. Diff each package file against a query's proof baseline — the
   commit that added the latest ``CORRECTNESS_r*.json`` in which the
   query was green (that commit's tree is exactly the snapshot the
   driver ran, plus report files) — and compute WHICH top-level
   symbols changed (AST dump comparison, docstrings stripped, so
   comment/whitespace edits never flag).
3. A proven query is STALE if its transitive reference closure
   intersects the changed-symbol set and it is not already staged in
   ``_WINDOW_PRIORITY``.

Exit 0 = every stale proof is staged for re-proof. Non-zero = gate red
until the window is restaged (or the change reverted).

Known imprecision, chosen deliberately: dynamic dispatch through dicts
keyed by runtime strings still resolves (the dict constant is a
referenced symbol and its value-AST includes the target names), but
monkey-patching or getattr-by-computed-name would not — neither
pattern exists in this package (enforced by style: plans are plain
column-expression functions).

Usage: python tools/proof_audit.py [--json]
"""

from __future__ import annotations

import ast
import glob
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "kaggle_data_pipeline_with_aws_spark"
sys.path.insert(0, ROOT)

Symbol = tuple[str, str]  # (module, top-level name)


# --------------------------------------------------------------------------
# parsing helpers
# --------------------------------------------------------------------------
def _module_name(rel_path: str) -> str:
    mod = rel_path[: -len(".py")].replace(os.sep, ".")
    return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod


def _package_files() -> dict[str, str]:
    """module name -> repo-relative path."""
    return {
        _module_name(os.path.relpath(p, ROOT)): os.path.relpath(p, ROOT)
        for p in glob.glob(os.path.join(ROOT, PKG, "**", "*.py"), recursive=True)
    }


def _strip_docstrings(node: ast.AST) -> ast.AST:
    for child in ast.walk(node):
        if isinstance(
            child, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef, ast.Module)
        ):
            body = getattr(child, "body", [])
            if (
                body
                and isinstance(body[0], ast.Expr)
                and isinstance(body[0].value, ast.Constant)
                and isinstance(body[0].value.value, str)
            ):
                child.body = body[1:] or [ast.Pass()]
    return node


def _top_level_symbols(tree: ast.Module) -> dict[str, ast.AST]:
    """name -> defining statement, for functions/classes/assignments."""
    out: dict[str, ast.AST] = {}
    for stmt in tree.body:
        if isinstance(stmt, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            out[stmt.name] = stmt
        elif isinstance(stmt, ast.Assign):
            for tgt in stmt.targets:
                if isinstance(tgt, ast.Name):
                    out[tgt.id] = stmt
        elif isinstance(stmt, ast.AnnAssign) and isinstance(stmt.target, ast.Name):
            out[stmt.target.id] = stmt
    return out


def _parse(source: str, filename: str) -> ast.Module:
    return _strip_docstrings(ast.parse(source, filename=filename))


# --------------------------------------------------------------------------
# symbol reference graph (current worktree)
# --------------------------------------------------------------------------
class _RefGraph:
    def __init__(self) -> None:
        self.files = _package_files()
        self.trees: dict[str, ast.Module] = {}
        self.symbols: dict[str, dict[str, ast.AST]] = {}
        for mod, rel in self.files.items():
            with open(os.path.join(ROOT, rel), encoding="utf-8") as f:
                tree = _parse(f.read(), rel)
            self.trees[mod] = tree
            self.symbols[mod] = _top_level_symbols(tree)
        self.edges: dict[Symbol, set[Symbol]] = {}
        for mod in self.files:
            self._build_module_edges(mod)

    # -- import resolution ------------------------------------------------
    def _import_map(self, mod: str) -> dict[str, tuple[str, str | None]]:
        """local alias -> (package module, symbol-or-None=whole module).

        Collected from EVERY import statement in the module (incl.
        function-local ones), mapped at module scope — conservative but
        correct for staleness.
        """
        parts = mod.split(".")
        aliases: dict[str, tuple[str, str | None]] = {}
        for node in ast.walk(self.trees[mod]):
            if isinstance(node, ast.Import):
                for al in node.names:
                    if al.name.startswith(PKG):
                        aliases[(al.asname or al.name).split(".")[0]] = (
                            al.name,
                            None,
                        )
            elif isinstance(node, ast.ImportFrom):
                if node.level:
                    base = parts[: len(parts) - node.level]
                    stem = ".".join(
                        base + ([node.module] if node.module else [])
                    )
                elif node.module and node.module.startswith(PKG):
                    stem = node.module
                else:
                    continue
                for al in node.names:
                    local = al.asname or al.name
                    sub = f"{stem}.{al.name}"
                    if sub in self.files:  # imported a submodule
                        aliases[local] = (sub, None)
                    elif stem in self.files:  # imported a symbol
                        aliases[local] = (stem, al.name)
        return aliases

    def _build_module_edges(self, mod: str) -> None:
        imap = self._import_map(mod)
        local_syms = self.symbols[mod]

        def refs_of(node: ast.AST) -> set[Symbol]:
            found: set[Symbol] = set()
            # Name nodes that are the base of a resolved module-attr
            # reference must NOT also count as bare module references
            # (that would degrade `dedup.simhash_pairs` to all of dedup)
            attr_bases: set[int] = set()
            for n in ast.walk(node):
                if isinstance(n, ast.Attribute) and isinstance(
                    n.value, ast.Name
                ):
                    tgt = imap.get(n.value.id)
                    if tgt and tgt[1] is None:  # module alias: resolve attr
                        attr_bases.add(id(n.value))
                        if n.attr in self.symbols.get(tgt[0], {}):
                            found.add((tgt[0], n.attr))
                        else:  # unresolvable -> whole module
                            found.update(
                                (tgt[0], s) for s in self.symbols.get(tgt[0], {})
                            )
            for n in ast.walk(node):
                if isinstance(n, ast.Name) and id(n) not in attr_bases:
                    if n.id in local_syms:
                        found.add((mod, n.id))
                    tgt = imap.get(n.id)
                    if tgt:
                        if tgt[1] is not None:
                            found.add((tgt[0], tgt[1]))
                        else:  # bare module reference: whole module
                            found.update(
                                (tgt[0], s) for s in self.symbols.get(tgt[0], {})
                            )
            return found

        for name, stmt in local_syms.items():
            edges = refs_of(stmt)
            edges.discard((mod, name))
            self.edges[(mod, name)] = edges

    def closure(self, roots: set[Symbol]) -> set[Symbol]:
        seen: set[Symbol] = set()
        stack = list(roots)
        while stack:
            sym = stack.pop()
            if sym in seen:
                continue
            seen.add(sym)
            stack.extend(self.edges.get(sym, ()))
        return seen


# --------------------------------------------------------------------------
# changed symbols vs a baseline commit
# --------------------------------------------------------------------------
def _git(*args: str, check: bool = True) -> str:
    r = subprocess.run(
        ["git", "-C", ROOT, *args], check=check, capture_output=True, text=True
    )
    return r.stdout


def changed_symbols(baseline: str, graph: _RefGraph) -> set[Symbol]:
    """Top-level symbols whose AST differs between baseline and worktree.

    A file whose module-level statements (outside any def) changed, or
    that fails to parse at the baseline, marks ALL its symbols changed.
    Files deleted since baseline likewise; files new since baseline
    contribute all their symbols (a proven query cannot depend on them
    unless its own module changed too, but conservative is fine).
    """
    changed: set[Symbol] = set()
    names = _git("diff", "--name-only", baseline).splitlines()
    for rel in names:
        if not (rel.startswith(PKG) and rel.endswith(".py")):
            continue
        mod = _module_name(rel)
        new_syms = graph.symbols.get(mod, {})
        old_src = _git("show", f"{baseline}:{rel}", check=False)
        if not old_src:
            changed.update((mod, s) for s in new_syms)  # new file
            continue
        try:
            old_tree = _parse(old_src, rel)
        except SyntaxError:
            changed.update((mod, s) for s in new_syms)
            continue
        old_syms = _top_level_symbols(old_tree)
        if mod not in graph.files:  # deleted/renamed module
            changed.update((mod, s) for s in old_syms)
            continue
        for name in set(old_syms) | set(new_syms):
            a, b = old_syms.get(name), new_syms.get(name)
            if a is None or b is None or ast.dump(a) != ast.dump(b):
                changed.add((mod, name))
        # module-level statements outside defs (imports excluded: alias
        # rebinding shows up through the symbols that use it only if
        # resolution changes — treat import changes as module-wide)
        def loose(tree: ast.Module, syms: dict[str, ast.AST]) -> str:
            kept = [
                s
                for s in tree.body
                if s not in syms.values()
                and not isinstance(s, (ast.Import, ast.ImportFrom))
            ]
            return "|".join(ast.dump(s) for s in kept)

        old_imports = [
            ast.dump(s)
            for s in old_tree.body
            if isinstance(s, (ast.Import, ast.ImportFrom))
        ]
        new_imports = [
            ast.dump(s)
            for s in graph.trees[mod].body
            if isinstance(s, (ast.Import, ast.ImportFrom))
        ]
        if loose(old_tree, old_syms) != loose(
            graph.trees[mod], new_syms
        ) or old_imports != new_imports:
            changed.update((mod, s) for s in set(old_syms) | set(new_syms))
    return changed


# --------------------------------------------------------------------------
# proof baselines from the CORRECTNESS series + git history
# --------------------------------------------------------------------------
def proof_baselines() -> dict[str, tuple[str, str]]:
    """query -> (correctness file, commit that added it), latest green."""
    out: dict[str, tuple[str, str]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        fname = os.path.basename(path)
        with open(path, encoding="utf-8") as f:
            rows = json.load(f)
        commits = _git("log", "--diff-filter=A", "--format=%H", "--", fname).split()
        if not commits:
            continue  # not committed yet (current round in progress)
        for q, r in rows.items():
            if r.get("rows_match") and r.get("schema_match") and not r.get("err"):
                out[q] = (fname, commits[0])  # later files overwrite: latest
    return out


# --------------------------------------------------------------------------
def audit() -> list[dict[str, object]]:
    from kaggle_data_pipeline_with_aws_spark.plans import registry

    registry.load_all()
    import __spark_entry__ as entry

    window = set(entry._WINDOW_PRIORITY)
    graph = _RefGraph()
    baselines = proof_baselines()
    changed_memo: dict[str, set[Symbol]] = {}
    violations = []
    for q, (fname, commit) in sorted(baselines.items()):
        if q in window:
            continue  # staged for re-proof
        fn = registry.QUERIES.get(q)
        if fn is None:
            continue  # retired from the registry
        if commit not in changed_memo:
            changed_memo[commit] = changed_symbols(commit, graph)
        deps = graph.closure({(fn.__module__, fn.__name__)})
        hits = sorted(
            f"{m.removeprefix(PKG + '.')}::{s}"
            for (m, s) in deps & changed_memo[commit]
        )
        if hits:
            violations.append({"query": q, "proof": fname, "changed_deps": hits})
    return violations


def main() -> int:
    violations = audit()
    if "--json" in sys.argv:
        print(json.dumps(violations, indent=2))
    if violations:
        for v in violations:
            print(
                f"STALE-PROOF {v['query']} (proven in {v['proof']}): "
                f"changed {', '.join(v['changed_deps'])} — "
                "add it to _WINDOW_PRIORITY or revert the change"
            )
        print(f"{len(violations)} stale proof(s)")
        return 1
    print("proof audit clean: no proven query has changed dependencies")
    return 0


if __name__ == "__main__":
    sys.exit(main())
