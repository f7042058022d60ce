"""Derive the stale-grade set: queries whose implementing code changed
AFTER the round that driver-graded them (VERDICT r7 "What's wrong" #2 /
"Next round" #2).

For each query in the registry, we take the LATEST driver grade round from
CORRECTNESS_r01..r0N, then compare a *semantic fingerprint* of the query's
implementation at HEAD against the same fingerprint at that round's
boundary commit ("round N: verdict/..." — the driver graded code at or
before that commit). The fingerprint is the source of the registered
builder function PLUS the transitive closure of every package function /
class it references (same-module helpers AND `from docling_api_spark.x
import y` helpers), so a grade goes stale when a shared quantile engine or
a same-file private helper changes, not just when the builder itself is
edited. Docstring-only edits count as changes on purpose: erring stale
costs one re-cert window slot; erring fresh leaves the driver's record
describing code that no longer exists.

    python tools/stale_grades.py            # table + summary
    python tools/stale_grades.py --names    # just the stale names, one/line

NOTE: "HEAD" means git HEAD, not the working tree — an uncommitted edit
is invisible to the staleness check (and therefore to the window policy
in tools/compose_window.py) until committed. Commit the operator change
first, then rotate.

Closure resolution is AST-based and intentionally coarse: any identifier
in a function body that names a module-level def/class in the same module
is pulled in; `from package.mod import name` pulls `name`'s def from that
module; `import package.mod [as alias]` followed by `alias.attr` pulls the
WHOLE referenced module (coarse, conservative). External imports (pyspark,
stdlib) are ignored.
"""

from __future__ import annotations

import ast
import hashlib
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "docling_api_spark"


def git(*args: str) -> str:
    return subprocess.check_output(["git", "-C", REPO, *args], text=True)


def boundary_commits() -> dict[int, str]:
    """round -> the 'round N: verdict' commit (driver graded at/before it)."""
    out = git("log", "--format=%H %s")
    bounds: dict[int, str] = {}
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subj, re.IGNORECASE)
        if m:
            bounds.setdefault(int(m.group(1)), sha)  # newest first; keep first
    return bounds


def grade_rounds(as_of_round: int | None = None) -> dict[str, int]:
    """query -> latest round with ANY driver record (green or rows-only).

    ``as_of_round`` caps the scan at CORRECTNESS files from rounds <
    as_of_round, so a window composed FOR round N stays reproducible
    after the round-N record lands (tools/compose_window.py pins this)."""
    grades: dict[str, int] = {}
    for path in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if as_of_round is not None and rnd >= as_of_round:
            continue
        with open(os.path.join(REPO, path)) as f:
            rec = json.load(f)
        for q in rec:
            grades[q] = max(grades.get(q, 0), rnd)
    return grades


def resolve_from_import(module: str, is_pkg: bool, node: ast.ImportFrom) -> str | None:
    """Absolute module targeted by an ImportFrom, resolving RELATIVE
    levels (r11 review: `from .mod import helper` never matched the
    startswith(PKG) filter, leaving relatively-imported helpers invisible
    to the staleness closure). Returns None when the level walks out of
    the package or nothing remains."""
    if not node.level:
        return node.module
    parts = module.split(".")
    if not is_pkg:
        parts = parts[:-1]  # containing package of a plain module
    if node.level - 1 > len(parts) - 1 and node.level > len(parts):
        return None
    parts = parts[: len(parts) - (node.level - 1)]
    if not parts:
        return None
    return ".".join(parts + ([node.module] if node.module else []))


class ModuleIndex:
    """Module-level defs + import map for one module's source."""

    def __init__(self, source: str, module: str = "", is_pkg: bool = False):
        self.tree = ast.parse(source)
        self.module = module
        self.is_pkg = is_pkg
        self.defs: dict[str, ast.AST] = {}
        self.from_imports: dict[str, tuple[str, str]] = {}  # local -> (module, name)
        self.mod_imports: dict[str, set[str]] = {}  # bound ident -> modules
        for node in self.tree.body:
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
                self.defs[node.name] = node
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name):
                        self.defs[t.id] = node
                    elif isinstance(t, (ast.Tuple, ast.List)):
                        for e in t.elts:
                            if isinstance(e, ast.Name):
                                self.defs[e.id] = node
            elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
                # `NAME: type = value` module constants (e.g. the magic-
                # byte tables in functions/formats.py) — invisible to a
                # plain-Assign scan, which would let edits to them slip
                # past the staleness check (r8 review finding)
                self.defs[node.target.id] = node
            elif isinstance(node, ast.ImportFrom):
                target = resolve_from_import(module, is_pkg, node)
                if target and target.startswith(PKG):
                    for a in node.names:
                        self.from_imports[a.asname or a.name] = (target, a.name)
            elif isinstance(node, ast.Import):
                for a in node.names:
                    if a.name.startswith(PKG):
                        # an UNALIASED dotted import (`import pkg.a.b`)
                        # binds only the ROOT identifier in scope, so key
                        # by what code actually references (r11 review:
                        # keying by the full dotted path never matched any
                        # ident and the module silently left the closure)
                        bound = a.asname or a.name.split(".")[0]
                        self.mod_imports.setdefault(bound, set()).add(a.name)


class TreeSnapshot:
    """Package source files at one commit, loaded lazily via `git show`."""

    def __init__(self, rev: str):
        self.rev = rev
        self._src: dict[str, str | None] = {}
        self._idx: dict[str, ModuleIndex | None] = {}

    def source(self, relpath: str) -> str | None:
        if relpath not in self._src:
            try:
                self._src[relpath] = git("show", f"{self.rev}:{relpath}")
            except subprocess.CalledProcessError:
                self._src[relpath] = None
        return self._src[relpath]

    def index(self, module: str) -> ModuleIndex | None:
        if module not in self._idx:
            rel = module.replace(".", "/") + ".py"
            src = self.source(rel)
            is_pkg = False
            if src is None:
                # packages: docling_api_spark.functions ->
                # docling_api_spark/functions/__init__.py (r10 advisor —
                # without this, a whole-package reference hashed nothing)
                src = self.source(module.replace(".", "/") + "/__init__.py")
                is_pkg = src is not None
            self._idx[module] = (
                ModuleIndex(src, module, is_pkg) if src is not None else None
            )
        return self._idx[module]


def closure(snap: TreeSnapshot, module: str, fname: str) -> dict | None:
    """{(module, name): ast-dump} reachable from module.fname, or None if
    the function doesn't exist at snap.rev."""
    idx0 = snap.index(module)
    if idx0 is None or fname not in idx0.defs:
        return None
    seen: dict[tuple[str, str], str] = {}
    stack = [(module, fname)]
    while stack:
        mod, name = stack.pop()
        if (mod, name) in seen:
            continue
        idx = snap.index(mod)
        # `from pkg import submodule` (r10 advisor): the imported name is
        # a MODULE, not a def in pkg/__init__.py — chasing (pkg, name)
        # would silently drop it. Redirect to the whole submodule. The
        # def wins if pkg/__init__.py really does define the name (a
        # re-export shadows its source module only when both exist).
        if (
            name != "*"
            and (idx is None or name not in idx.defs)
            and snap.index(f"{mod}.{name}") is not None
        ):
            stack.append((f"{mod}.{name}", "*"))
            continue
        if idx is None:
            continue
        if name == "*":  # whole module (coarse `import x as y; y.f()` case)
            seen[(mod, "*")] = ast.dump(idx.tree)
            continue
        node = idx.defs.get(name)
        if node is None:
            # RE-EXPORTED name (r11 advisor follow-up): pkg/__init__.py
            # binds it via `from pkg.sub import name` without a matching
            # pkg/name.py submodule, so the redirect above never fired —
            # chase the recorded import source instead of dropping it.
            if name in idx.from_imports:
                stack.append(idx.from_imports[name])
            continue
        seen[(mod, name)] = ast.dump(node)
        idents = {n.id for n in ast.walk(node) if isinstance(n, ast.Name)}
        # alias.attr -> whole aliased module
        for n in ast.walk(node):
            if isinstance(n, ast.Attribute) and isinstance(n.value, ast.Name):
                idents.add(n.value.id)
        # FUNCTION-LEVEL imports (r10): `from package.mod import y` inside
        # a def body never reaches ModuleIndex (it scans module-level
        # statements only), so a query builder that defers its package
        # imports — the lazy-import idiom every streaming query uses —
        # had its imported helpers INVISIBLE to the staleness check
        # (found when q151's closure missed this round's
        # streaming/stateful.py edit). Walk the node's own import
        # statements and chase package targets directly.
        for n in ast.walk(node):
            if isinstance(n, ast.ImportFrom):
                target = resolve_from_import(mod, idx.is_pkg, n)
                if target and target.startswith(PKG):
                    for a in n.names:
                        stack.append((target, a.name))
            elif isinstance(n, ast.Import):
                for a in n.names:
                    if a.name.startswith(PKG):
                        stack.append((a.name, "*"))
        for ident in idents:
            # (self-recursion needs no special case: the seen-guard above
            # terminates it)
            if ident in idx.defs:
                stack.append((mod, ident))
            if ident in idx.from_imports:
                smod, sname = idx.from_imports[ident]
                stack.append((smod, sname))
            for imported_mod in idx.mod_imports.get(ident, ()):
                stack.append((imported_mod, "*"))
    return seen


def changed_members(then: dict, now: dict) -> list[str]:
    out = []
    for key in sorted(set(then) | set(now)):
        if then.get(key) != now.get(key):
            out.append(f"{key[0].rsplit('.', 1)[-1]}.{key[1]}")
    return out


def compute_stale(
    as_of_round: int | None = None,
) -> tuple[list[tuple[str, int, str]], int, int, dict[str, int]]:
    """(stale [(name, grade_round, reason)] sorted by (round, name),
    fresh count, missing count, grade-round map) at HEAD — reusable by
    tools/compose_window.py and the window-policy test."""
    sys.path.insert(0, REPO)
    from docling_api_spark.plans import all_queries  # noqa: E402

    queries = all_queries()

    bounds = boundary_commits()
    grades = grade_rounds(as_of_round)
    head = TreeSnapshot("HEAD")
    snaps = {r: TreeSnapshot(sha) for r, sha in bounds.items()}

    stale: list[tuple[str, int, str]] = []
    fresh = missing = 0
    for qname, q in queries.items():
        rnd = grades.get(qname)
        if rnd is None:
            continue
        if rnd not in snaps:
            # a graded round with no recognized 'round N: verdict' commit
            # must be VISIBLE, not silently exempt (r11 review: a commit-
            # subject deviation would otherwise freeze ~50 grades as
            # implicitly fresh forever) — surface it as stale so the
            # window policy re-certifies and a human sees the reason
            stale.append((qname, rnd, "no-boundary-commit-for-round"))
            missing += 1
            continue
        module = q.fn.__module__
        fname = q.fn.__name__
        cl_now = closure(head, module, fname)
        cl_then = closure(snaps[rnd], module, fname)
        if cl_then is None:
            stale.append((qname, rnd, "not-found-at-boundary"))
            missing += 1
        elif cl_now != cl_then:
            diff = changed_members(cl_then, cl_now)
            stale.append((qname, rnd, "changed: " + ", ".join(diff[:6])))
        else:
            fresh += 1

    stale.sort(key=lambda t: (t[1], t[0]))
    return stale, fresh, missing, grades


def main() -> None:
    names_only = "--names" in sys.argv
    stale, fresh, missing, grades = compute_stale()
    if names_only:
        for qname, _, _ in stale:
            print(qname)
        return
    from docling_api_spark.plans import all_queries  # noqa: E402

    queries = all_queries()
    print(f"{'query':40s} {'graded':>6s} reason")
    for qname, rnd, why in stale:
        print(f"{qname:40s} r{rnd:<5d} {why}")
    print(
        f"\n{len(stale)} stale / {fresh} fresh / "
        f"{missing} missing-at-boundary, of {len(grades)} graded"
    )
    # Rows-only stales get their own callout (VERDICT r9 Next #6): a
    # rows-only grade (oracle=None — q72's converter pipeline, q175's
    # sequential debounce, ...) is the WEAK certification, so it going
    # stale is silent in a way a hash-graded query is not — the driver's
    # next window must re-cert these first. q72 especially: its closure
    # spans the whole formats/converter stack, so it trips whenever any
    # of those files move.
    rows_only_stale = [
        (qname, rnd, why)
        for qname, rnd, why in stale
        if qname in queries and queries[qname].oracle is None
    ]
    if rows_only_stale:
        print(
            f"rows-only stale ({len(rows_only_stale)}; weak grades — "
            "re-cert priority): "
            + ", ".join(f"{q} (r{r})" for q, r, _ in rows_only_stale)
        )
    else:
        print("rows-only stale (0): none — every weak grade is current")


if __name__ == "__main__":
    main()
