"""Unit tests for tools/stale_grades.py's closure fingerprinting — the
derivation behind the round-8 re-cert window (VERDICT r7 Next #2). The
tool must catch a grade gone stale through a HELPER change (same-module
private fn, cross-module `from package import` helper) and must NOT
flag a query whose closure is byte-identical."""

from __future__ import annotations

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "stale_grades",
    os.path.join(os.path.dirname(__file__), "..", "tools", "stale_grades.py"),
)
sg = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(sg)

PKG = sg.PKG  # docling_api_spark

OPS_MOD = f"{PKG}.operators.fake"
HELPER_MOD = f"{PKG}.functions.fakehelper"

OPS_SRC_V1 = f"""
from {HELPER_MOD} import shared_cut

def _local_helper(df):
    return df + 1

def query_a(spark, sf):
    return _local_helper(shared_cut(spark, sf))

def query_b(spark, sf):
    return 42
"""

HELPER_SRC_V1 = """
def shared_cut(spark, sf):
    return spark
"""


class FakeSnapshot:
    """stale_grades.TreeSnapshot stand-in over in-memory sources."""

    def __init__(self, sources: dict[str, str]):
        self.sources = sources
        self._idx: dict[str, object] = {}

    def index(self, module: str):
        if module not in self._idx:
            src = self.sources.get(module)
            # package heuristic mirroring TreeSnapshot: a module is a
            # package when another source nests under it
            is_pkg = any(k.startswith(module + ".") for k in self.sources)
            self._idx[module] = (
                sg.ModuleIndex(src, module, is_pkg) if src is not None else None
            )
        return self._idx[module]


def _snap(ops_src: str = OPS_SRC_V1, helper_src: str = HELPER_SRC_V1) -> FakeSnapshot:
    return FakeSnapshot({OPS_MOD: ops_src, HELPER_MOD: helper_src})


def test_identical_sources_fingerprint_equal():
    a = sg.closure(_snap(), OPS_MOD, "query_a")
    b = sg.closure(_snap(), OPS_MOD, "query_a")
    assert a == b
    assert (OPS_MOD, "query_a") in a
    assert (OPS_MOD, "_local_helper") in a  # same-module helper pulled in
    assert (HELPER_MOD, "shared_cut") in a  # cross-module helper pulled in


def test_builder_change_detected():
    changed = OPS_SRC_V1.replace("return 42", "return 43")
    a = sg.closure(_snap(), OPS_MOD, "query_b")
    b = sg.closure(_snap(ops_src=changed), OPS_MOD, "query_b")
    assert a != b
    assert sg.changed_members(a, b) == ["fake.query_b"]


def test_same_module_helper_change_detected():
    changed = OPS_SRC_V1.replace("df + 1", "df + 2")
    a = sg.closure(_snap(), OPS_MOD, "query_a")
    b = sg.closure(_snap(ops_src=changed), OPS_MOD, "query_a")
    assert a != b
    assert "fake._local_helper" in sg.changed_members(a, b)


def test_cross_module_helper_change_detected():
    changed_helper = HELPER_SRC_V1.replace("return spark", "return sf")
    a = sg.closure(_snap(), OPS_MOD, "query_a")
    b = sg.closure(_snap(helper_src=changed_helper), OPS_MOD, "query_a")
    assert a != b
    assert "fakehelper.shared_cut" in sg.changed_members(a, b)


def test_unrelated_change_not_flagged():
    # editing query_b must not stale query_a (helper closure is per-query)
    changed = OPS_SRC_V1.replace("return 42", "return 43")
    a = sg.closure(_snap(), OPS_MOD, "query_a")
    b = sg.closure(_snap(ops_src=changed), OPS_MOD, "query_a")
    assert a == b


def test_missing_function_returns_none():
    assert sg.closure(_snap(), OPS_MOD, "nonexistent") is None
    assert sg.closure(FakeSnapshot({}), OPS_MOD, "query_a") is None


def test_annotated_and_tuple_constants_detected():
    """AnnAssign (`NAME: type = ...`) and tuple-unpack module constants
    must enter the closure — a plain-Assign-only scan let edits to e.g.
    the magic-byte tables in functions/formats.py slip past the
    staleness check (r8 review finding)."""
    ops = f"""
LIMIT: int = 10
A, B = 1, 2

def query_d(spark, sf):
    return LIMIT + A
"""
    a = sg.closure(FakeSnapshot({OPS_MOD: ops}), OPS_MOD, "query_d")
    assert (OPS_MOD, "LIMIT") in a and (OPS_MOD, "A") in a
    changed_ann = ops.replace("LIMIT: int = 10", "LIMIT: int = 20")
    b = sg.closure(FakeSnapshot({OPS_MOD: changed_ann}), OPS_MOD, "query_d")
    assert a != b and "fake.LIMIT" in sg.changed_members(a, b)
    changed_tup = ops.replace("A, B = 1, 2", "A, B = 3, 2")
    c = sg.closure(FakeSnapshot({OPS_MOD: changed_tup}), OPS_MOD, "query_d")
    assert a != c and "fake.A" in sg.changed_members(a, c)


def test_module_alias_import_pulls_whole_module():
    ops = f"""
import {HELPER_MOD} as h

def query_c(spark, sf):
    return h.shared_cut(spark, sf)
"""
    a = sg.closure(_snap(ops_src=ops), OPS_MOD, "query_c")
    assert (HELPER_MOD, "*") in a  # coarse whole-module dependency
    changed_helper = HELPER_SRC_V1 + "\nEXTRA = 1\n"
    b = sg.closure(
        FakeSnapshot({OPS_MOD: ops, HELPER_MOD: changed_helper}), OPS_MOD, "query_c"
    )
    assert a != b


def test_from_package_import_submodule_chases_module():
    """r10 advisor: `from pkg import submodule` pushes (pkg, 'submodule'),
    which the pre-fix closure dropped because 'submodule' is not a def in
    pkg/__init__.py — leaving the submodule's contents invisible. The fix
    redirects to the whole submodule, both for module-level and
    function-level (lazy) imports."""
    pkg_mod = f"{PKG}.functions"
    ops_module_level = f"""
from {PKG}.functions import fakehelper

def query_e(spark, sf):
    return fakehelper.shared_cut(spark, sf)
"""
    ops_fn_level = f"""
def query_e(spark, sf):
    from {PKG}.functions import fakehelper
    return fakehelper.shared_cut(spark, sf)
"""
    for ops in (ops_module_level, ops_fn_level):
        snap = FakeSnapshot(
            {OPS_MOD: ops, pkg_mod: "", HELPER_MOD: HELPER_SRC_V1}
        )
        a = sg.closure(snap, OPS_MOD, "query_e")
        assert (HELPER_MOD, "*") in a, ops
        changed = FakeSnapshot(
            {OPS_MOD: ops, pkg_mod: "",
             HELPER_MOD: HELPER_SRC_V1 + "\nEXTRA = 2\n"}
        )
        b = sg.closure(changed, OPS_MOD, "query_e")
        assert a != b


def test_reexport_def_shadows_submodule():
    """If pkg/__init__.py genuinely defines the imported name, the def
    wins (re-export case) — the submodule redirect must not misfire."""
    pkg_mod = f"{PKG}.functions"
    pkg_src = """
def fakehelper(x):
    return x
"""
    ops = f"""
from {PKG}.functions import fakehelper

def query_f(spark, sf):
    return fakehelper(sf)
"""
    snap = FakeSnapshot(
        {OPS_MOD: ops, pkg_mod: pkg_src, HELPER_MOD: HELPER_SRC_V1}
    )
    a = sg.closure(snap, OPS_MOD, "query_f")
    assert (pkg_mod, "fakehelper") in a
    assert (HELPER_MOD, "*") not in a


def test_reexport_without_submodule_chased_via_from_imports():
    """r11 review finding: `from pkg import name` where pkg/__init__.py
    RE-EXPORTS name (`from pkg.sub import name`) and no pkg/name.py
    exists — the submodule redirect can't fire and the pre-fix closure
    dropped the name entirely, so edits to the real source module never
    staled the grade. The fix chases pkg/__init__'s from_imports."""
    pkg_mod = f"{PKG}.functions"
    pkg_src = f"from {HELPER_MOD} import shared_cut\n"
    ops = f"""
from {PKG}.functions import shared_cut

def query_g(spark, sf):
    return shared_cut(spark, sf)
"""
    snap = FakeSnapshot(
        {OPS_MOD: ops, pkg_mod: pkg_src, HELPER_MOD: HELPER_SRC_V1}
    )
    a = sg.closure(snap, OPS_MOD, "query_g")
    assert (HELPER_MOD, "shared_cut") in a
    changed = FakeSnapshot(
        {OPS_MOD: ops, pkg_mod: pkg_src,
         HELPER_MOD: HELPER_SRC_V1.replace("return spark", "return sf")}
    )
    b = sg.closure(changed, OPS_MOD, "query_g")
    assert a != b


def test_unaliased_dotted_import_chases_module():
    """r11 review (reproduced): `import pkg.a.b` without an alias binds
    only the ROOT identifier, but mod_imports was keyed by the full
    dotted path — code referencing pkg.a.b.fn never matched, so the
    module silently left the closure and its edits never staled the
    grade."""
    ops = f"""
import {HELPER_MOD}

def query_h(spark, sf):
    return {HELPER_MOD}.shared_cut(spark, sf)
"""
    snap = FakeSnapshot({OPS_MOD: ops, HELPER_MOD: HELPER_SRC_V1})
    a = sg.closure(snap, OPS_MOD, "query_h")
    assert (HELPER_MOD, "*") in a
    changed = FakeSnapshot(
        {OPS_MOD: ops, HELPER_MOD: HELPER_SRC_V1 + "\nEXTRA = 3\n"}
    )
    assert a != sg.closure(changed, OPS_MOD, "query_h")


def test_relative_imports_resolved():
    """r11 review: `from .sibling import helper` (module-level and
    function-level lazy form) failed the startswith(PKG) filter and the
    helper stayed invisible to the staleness check."""
    sibling_mod = f"{PKG}.operators.fakesibling"
    sibling_src = """
def rel_helper(spark, sf):
    return spark
"""
    ops_module_level = """
from .fakesibling import rel_helper

def query_i(spark, sf):
    return rel_helper(spark, sf)
"""
    ops_fn_level = """
def query_i(spark, sf):
    from .fakesibling import rel_helper
    return rel_helper(spark, sf)
"""
    for ops in (ops_module_level, ops_fn_level):
        snap = FakeSnapshot({OPS_MOD: ops, sibling_mod: sibling_src})
        a = sg.closure(snap, OPS_MOD, "query_i")
        assert (sibling_mod, "rel_helper") in a, ops
        changed = FakeSnapshot(
            {OPS_MOD: ops,
             sibling_mod: sibling_src.replace("return spark", "return sf")}
        )
        assert a != sg.closure(changed, OPS_MOD, "query_i"), ops
