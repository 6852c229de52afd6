"""Re-pin lint: machine-check the registry's verification-void rule.

The rule (plans/registry.py): a driver verification from BEFORE an
implementation change is void — any round-N change to code a query's
plan depends on must re-enter that query into ``_RECHECK_PIN`` (or the
query must not be in ``_DRIVER_VERIFIED`` at all) so the driver's
50-slot prefix re-records it. Round 7 applied this discipline by hand;
this lint turns it into a failing test (VERDICT r7, Next #4).

How: diff the working tree against the last round-boundary commit
(newest commit whose subject starts ``round N:`` — the driver writes
one per round), find the top-level names whose source text changed in
each ``scrappy_spark/*.py`` file, then propagate "changed" through a
name-reference graph:

- within a module, a top-level def/class/constant is affected when its
  body (decorators included) references an affected top-level name;
- across modules, ``from X import y`` (module-level or nested inside a
  function — the repo's late-import convention) links the importer's
  defs to ``(X, y)``, and ``from . import mod`` / ``import pkg.mod``
  usage links ``alias.attr`` references to ``(mod, attr)``.

A registered query is VOIDED when its plan function's ``(module,
qualname)`` lands in the affected fixpoint. The lint fails when a
voided query is still claimed verified (in ``_DRIVER_VERIFIED``) and
not re-pinned (``_RECHECK_PIN``).

Static best-effort by design: dynamic dispatch (getattr, registry
indirection) is invisible to it, so it can under-report — it exists to
catch the common case (an operator edit whose queries someone forgot to
re-pin), not to replace the discipline. It never executes Spark.

Usage: python tools/repin_lint.py   (exit 1 on violations)
"""

from __future__ import annotations

import ast
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "scrappy_spark"


def _round_base_commit() -> str | None:
    out = subprocess.run(
        ["git", "log", "--format=%H %s"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if re.match(r"round \d+:", subj):
            return sha
    return None


def _git_show(base: str, relpath: str) -> str | None:
    r = subprocess.run(
        ["git", "show", f"{base}:{relpath}"],
        cwd=REPO, capture_output=True, text=True,
    )
    return r.stdout if r.returncode == 0 else None  # None: new file


def _toplevel_segments(src: str) -> dict[str, str]:
    """name -> source segment for every top-level def/class/assign."""
    tree = ast.parse(src)
    out: dict[str, str] = {}
    for node in tree.body:
        names: list[str] = []
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            names = [node.name]
        elif isinstance(node, (ast.Assign, ast.AnnAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                if isinstance(t, ast.Name):
                    names.append(t.id)
        seg = ast.get_source_segment(src, node) or ""
        for n in names:
            out[n] = seg
    return out


def changed_toplevel_names(old_src: str | None, new_src: str) -> set[str]:
    new = _toplevel_segments(new_src)
    if old_src is None:
        return set(new)
    old = _toplevel_segments(old_src)
    return {n for n in set(old) | set(new) if old.get(n) != new.get(n)}


def _resolve_from(module: str, node: ast.ImportFrom) -> str | None:
    """Absolute module path for an ImportFrom seen inside ``module``."""
    if node.level == 0:
        mod = node.module or ""
        return mod if mod.startswith(PKG) else None
    parts = module.split(".")
    base = parts[: len(parts) - node.level]
    if node.module:
        base = base + node.module.split(".")
    return ".".join(base) if base and base[0] == PKG else None


class _DefScan(ast.NodeVisitor):
    """Collect, for one top-level def (or constant expression): loaded
    bare names, ``alias.attr`` attribute loads, and nested from-imports."""

    def __init__(self) -> None:
        self.names: set[str] = set()
        self.attrs: set[tuple[str, str]] = set()
        self.imports: list[ast.ImportFrom] = []

    def visit_Name(self, node: ast.Name) -> None:
        self.names.add(node.id)

    def visit_Attribute(self, node: ast.Attribute) -> None:
        if isinstance(node.value, ast.Name):
            self.attrs.add((node.value.id, node.attr))
        self.generic_visit(node)

    def visit_ImportFrom(self, node: ast.ImportFrom) -> None:
        self.imports.append(node)


def _module_files() -> dict[str, str]:
    """module name -> file path for every .py under scrappy_spark/."""
    mods: dict[str, str] = {}
    for dirpath, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(dirpath, f), REPO)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")]
            mods[mod] = os.path.join(dirpath, f)
    return mods


def _build_refgraph() -> dict[tuple[str, str], set[tuple[str, str]]]:
    """(module, def) -> referenced (module, name) pairs, resolved."""
    mods = _module_files()
    graph: dict[tuple[str, str], set[tuple[str, str]]] = {}
    for module, path in mods.items():
        with open(path) as fh:
            src = fh.read()
        try:
            tree = ast.parse(src)
        except SyntaxError:
            continue
        # module-level import aliases: alias -> (module, name) for
        # `from X import y as alias`; alias -> module for whole-module
        mod_name_alias: dict[str, tuple[str, str]] = {}
        mod_mod_alias: dict[str, str] = {}
        for node in tree.body:
            if isinstance(node, ast.ImportFrom):
                target = _resolve_from(module, node)
                if target is None:
                    continue
                for a in node.names:
                    alias = a.asname or a.name
                    sub = f"{target}.{a.name}"
                    if sub in mods:       # `from . import mod`
                        mod_mod_alias[alias] = sub
                    else:
                        mod_name_alias[alias] = (target, a.name)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        mod_mod_alias[a.asname or a.name] = a.name
        local = set(_toplevel_segments(src))
        for node in tree.body:
            names: list[str] = []
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                names = [node.name]
            elif isinstance(node, (ast.Assign, ast.AnnAssign)):
                targets = node.targets if isinstance(node, ast.Assign) else [node.target]
                names = [t.id for t in targets if isinstance(t, ast.Name)]
            if not names:
                continue
            scan = _DefScan()
            scan.visit(node)
            # nested (late) from-imports inside the def body
            nested_alias: dict[str, tuple[str, str]] = {}
            nested_mod: dict[str, str] = {}
            for imp in scan.imports:
                target = _resolve_from(module, imp)
                if target is None:
                    continue
                for a in imp.names:
                    alias = a.asname or a.name
                    sub = f"{target}.{a.name}"
                    if sub in mods:
                        nested_mod[alias] = sub
                    else:
                        nested_alias[alias] = (target, a.name)
            refs: set[tuple[str, str]] = set()
            for ident in scan.names:
                if ident in nested_alias:
                    refs.add(nested_alias[ident])
                elif ident in mod_name_alias:
                    refs.add(mod_name_alias[ident])
                elif ident in local and ident not in names:
                    refs.add((module, ident))
            for owner, attr in scan.attrs:
                target = nested_mod.get(owner) or mod_mod_alias.get(owner)
                if target is not None:
                    refs.add((target, attr))
            for n in names:
                graph.setdefault((module, n), set()).update(refs)
    return graph


def affected_defs(seed: set[tuple[str, str]]) -> set[tuple[str, str]]:
    graph = _build_refgraph()
    affected = set(seed)
    changed = True
    while changed:
        changed = False
        for key, refs in graph.items():
            if key not in affected and refs & affected:
                affected.add(key)
                changed = True
    return affected


def lint() -> int:
    base = _round_base_commit()
    if base is None:
        print("repin_lint: no round-boundary commit found; skipping")
        return 0
    diff = subprocess.run(
        ["git", "diff", "--name-only", base, "--", f"{PKG}/"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.split()
    changed_files = [f for f in diff if f.endswith(".py")]
    seed: set[tuple[str, str]] = set()
    for rel in changed_files:
        module = rel[:-3].replace(os.sep, ".")
        if module.endswith(".__init__"):
            module = module[: -len(".__init__")]
        path = os.path.join(REPO, rel)
        new_src = open(path).read() if os.path.exists(path) else ""
        for name in changed_toplevel_names(_git_show(base, rel), new_src):
            seed.add((module, name))
    if not seed:
        print(f"repin_lint: no {PKG} source changes since {base[:9]}; clean")
        return 0
    affected = affected_defs(seed)

    from scrappy_spark.plans import registry

    registry.all_specs()  # force registration
    voided = sorted(
        name
        for name, spec in registry._REGISTRY.items()
        if (spec.fn.__module__, spec.fn.__qualname__) in affected
    )
    missing_pin = [
        n
        for n in voided
        if n in registry._DRIVER_VERIFIED and n not in registry._RECHECK_PIN
    ]
    print(
        f"repin_lint: base {base[:9]}, {len(changed_files)} changed files, "
        f"{len(seed)} changed defs, {len(voided)} queries voided"
    )
    for n in voided:
        tag = (
            "PINNED" if n in registry._RECHECK_PIN
            else "unverified" if n not in registry._DRIVER_VERIFIED
            else "MISSING PIN"
        )
        print(f"  {tag:11s} {n}")
    if missing_pin:
        print(
            f"VIOLATION: {len(missing_pin)} verified queries depend on "
            f"round-changed code but are not in _RECHECK_PIN: {missing_pin}"
        )
        return 1
    print("0 violations")
    return 0


if __name__ == "__main__":
    sys.exit(lint())
