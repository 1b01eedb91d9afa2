"""Mechanical check of the changed-code-in-window rule (r5 verdict, item 5).

The driver's correctness artifact certifies only the FIRST 50 registry
entries (the ``_FRONT_WINDOW`` in ``simtradedata_spark/queries.py``).  The
r4 advisory rule says: every registered query whose code changed in the
current round MUST sit inside that window.  Round 5 applied the rule
per-file by judgment and missed queries that merely *import* a changed
module; this tool mechanizes the rule at **definition granularity**:

1. ``git diff <base>`` (working tree included) → changed line ranges per
   package ``.py`` file → the enclosing top-level definitions (functions,
   classes, assignments) are the taint seeds.
2. A cross-module fixpoint propagates taint along *references*: a top-level
   definition becomes tainted if it references a tainted name in its own
   module, a tainted symbol it imports (module-level or function-local
   ``from m import x``), a tainted attribute of a module it imports, or a
   tainted *method name* (class methods are their own taint units; a tainted
   method propagates through any ``obj.method`` attribute reference, module-
   agnostically — conservative, since attr names aren't resolved to classes).
   Changing a dunder (``__init__`` etc.) taints the whole class. Definition
   granularity matters: changing ``dedup.cosine_near_dups`` must not taint
   every query that imports ``dedup.tokens``, and changing
   ``SyntheticMarket.fundamentals`` must not taint every ``.bars()`` query —
   module- or class-level taint floods more queries than the 50-slot window
   can hold.
3. A registered query is TAINTED if its query function or oracle constant
   ends up tainted. FAIL if any tainted query is outside the front window,
   or the window does not hold exactly 50 registry names.

Everything is static (``ast`` over sources + the registry dict literal) —
no Spark session, runs in ~1s.

Usage: python tools/window_lint.py [--base <ref>] [--list]
  --base  diff base; default = newest commit whose subject starts with
          'round N:' (the driver's round-start snapshot).
  --list  print the tainted-query → reason map even on success.
"""

from __future__ import annotations

import argparse
import ast
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "simtradedata_spark"
WINDOW_SIZE = 50


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, check=True, capture_output=True, text=True
    ).stdout


def default_base() -> str:
    out = _git("log", "--format=%H %s", "-200")
    for line in out.splitlines():
        sha, _, subj = line.partition(" ")
        if subj.startswith("round ") and subj.split(" ", 2)[1].rstrip(":").isdigit():
            return sha
    return out.splitlines()[-1].split()[0]  # oldest of the last 200


def changed_line_ranges(base: str, path: str) -> list[tuple[int, int]]:
    """New-file line ranges [start, end] (1-based inclusive) from -U0 hunks."""
    out = _git("diff", "-U0", base, "--", path)
    ranges = []
    for line in out.splitlines():
        if not line.startswith("@@"):
            continue
        plus = line.split("+", 1)[1].split(" ", 1)[0]
        start, _, cnt = plus.partition(",")
        start, cnt = int(start), int(cnt) if cnt else 1
        if cnt == 0:  # pure deletion: taint the neighboring line
            ranges.append((max(start, 1), max(start, 1)))
        else:
            ranges.append((start, start + cnt - 1))
    return ranges


def file_to_module(path: str) -> str | None:
    if not path.startswith(PKG + "/") or not path.endswith(".py"):
        return None
    mod = path[: -len(".py")].replace("/", ".")
    return mod[: -len(".__init__")] if mod.endswith(".__init__") else mod


class TopLevel:
    """One taint unit: a module top-level definition, or a single class
    method (``owner`` set). Tracks names it binds, names/attrs it
    references, and symbols it imports."""

    def __init__(self, node: ast.AST, owner: str | None = None):
        self.node = node
        self.owner = owner  # class name, for method units
        self.names = self._bound_names(node)
        # For a ClassDef, scan only class-level statements (bases, decorators,
        # non-method body) — methods are separate taint units; scanning them
        # here would taint the whole class whenever any method references
        # tainted code, flooding every user of any of its methods.
        if isinstance(node, ast.ClassDef):
            scan = (
                [s for s in node.body if not isinstance(s, (ast.FunctionDef, ast.AsyncFunctionDef))]
                + node.bases
                + node.decorator_list
            )
        else:
            scan = [node]
        walked = [n for s in scan for n in ast.walk(s)]
        self.refs = {n.id for n in walked if isinstance(n, ast.Name)} | {
            n.attr for n in walked if isinstance(n, ast.Attribute)
        }
        # function-local `from pkg.x import y [as z]` inside this definition
        self.sym_imports: dict[str, tuple[str, str]] = {}  # local → (mod, name)
        self.mod_imports: set[str] = set()  # whole modules referenced via attrs
        for n in walked:
            if isinstance(n, ast.ImportFrom) and n.module and n.module.startswith(PKG):
                for a in n.names:
                    self.sym_imports[a.asname or a.name] = (n.module, a.name)
                    self.mod_imports.add(f"{n.module}.{a.name}")  # submodule case
            elif isinstance(n, ast.Import):
                for a in n.names:
                    if a.name.startswith(PKG):
                        self.mod_imports.add(a.name)
        self.span = (node.lineno, getattr(node, "end_lineno", node.lineno))

    @staticmethod
    def _bound_names(node: ast.AST) -> set[str]:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            return {node.name}
        out = set()
        if isinstance(node, (ast.Assign, ast.AnnAssign, ast.AugAssign)):
            targets = node.targets if isinstance(node, ast.Assign) else [node.target]
            for t in targets:
                for n in ast.walk(t):
                    if isinstance(n, ast.Name):
                        out.add(n.id)
        return out


class Module:
    def __init__(self, modname: str, path: str):
        self.name = modname
        tree = ast.parse(open(path, encoding="utf-8").read())
        self.toplevels: list[TopLevel] = []
        self.module_sym_imports: dict[str, tuple[str, str]] = {}
        self.registry: dict[str, tuple] = {}
        self.window: list[str] = []
        for node in tree.body:
            if isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
                for a in node.names:
                    self.module_sym_imports[a.asname or a.name] = (node.module, a.name)
                continue
            if isinstance(node, (ast.Import,)):
                continue
            tl = TopLevel(node)
            self.toplevels.append(tl)
            if isinstance(node, ast.ClassDef):
                # method-level taint units; the ClassDef unit itself keeps
                # the full span but is only seeded for non-method lines
                tl.method_units = [
                    TopLevel(sub, owner=node.name)
                    for sub in node.body
                    if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef))
                ]
                self.toplevels.extend(tl.method_units)
            if (
                isinstance(node, (ast.Assign, ast.AnnAssign))
                and tl.names == {"QUERIES"}
                and not self.registry
                and isinstance(node.value, ast.Dict)
            ):
                def part(e: ast.AST) -> str | None:
                    if isinstance(e, ast.Name):
                        return e.id
                    # `"x": (q_x, _sql_x())` — taint tracks the builder fn
                    if isinstance(e, ast.Call) and isinstance(e.func, ast.Name):
                        return e.func.id
                    return None

                for k, v in zip(node.value.keys, node.value.values):
                    if isinstance(k, ast.Constant) and isinstance(v, ast.Tuple):
                        self.registry[k.value] = tuple(part(e) for e in v.elts)
            if isinstance(node, ast.Assign) and tl.names == {"_FRONT_WINDOW"}:
                self.window = [
                    e.value
                    for e in node.value.elts
                    if isinstance(e, ast.Constant) and isinstance(e.value, str)
                ]


def package_modules() -> dict[str, Module]:
    mods = {}
    for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(root, f), REPO).replace(os.sep, "/")
                m = file_to_module(rel)
                if m:
                    mods[m] = Module(m, os.path.join(root, f))
    return mods


def compute_taint(
    base: str, mods: dict[str, Module]
) -> tuple[dict[str, set[str]], set[str]]:
    """(module → tainted top-level names, tainted method/attr names),
    seeded from the diff and propagated along references to a fixpoint."""
    changed = [f for f in _git("diff", "--name-only", base, "--", "*.py").splitlines() if f]
    taint: dict[str, set[str]] = {m: set() for m in mods}
    attr_taint: set[str] = set()  # tainted class-method names, module-agnostic

    def taint_unit(tl: TopLevel, mod: Module) -> bool:
        """Mark one unit tainted; returns True if anything new was marked."""
        grew = False
        if tl.owner:  # a class method
            name = next(iter(tl.names))
            if name.startswith("__"):  # dunder → whole class is tainted
                if tl.owner not in taint[mod.name]:
                    taint[mod.name].add(tl.owner)
                    grew = True
            elif name not in attr_taint:
                attr_taint.add(name)
                grew = True
        elif tl.names - taint[mod.name]:
            taint[mod.name] |= tl.names
            grew = True
            # whole-class taint implies every method is tainted
            for mu in getattr(tl, "method_units", []):
                m_name = next(iter(mu.names))
                if not m_name.startswith("__") and m_name not in attr_taint:
                    attr_taint.add(m_name)
        return grew

    for f in changed:
        m = file_to_module(f)
        if m not in mods:
            continue
        method_units = [tl for tl in mods[m].toplevels if tl.owner]
        for lo, hi in changed_line_ranges(base, f):
            hit_methods = [
                tl for tl in method_units if tl.span[0] <= hi and lo <= tl.span[1]
            ]
            for tl in hit_methods:
                taint_unit(tl, mods[m])
            for tl in mods[m].toplevels:
                if tl.owner or not (tl.span[0] <= hi and lo <= tl.span[1]):
                    continue
                if isinstance(tl.node, ast.ClassDef) and any(
                    mu in hit_methods for mu in getattr(tl, "method_units", [])
                ):
                    continue  # change was inside a method, not the class body
                taint_unit(tl, mods[m])

    def tainted_via(tl: TopLevel, mod: Module) -> bool:
        if tl.refs & taint[mod.name]:  # same-module reference
            return True
        if tl.refs & attr_taint:  # obj.method where method is tainted
            return True
        for local, (src, orig) in {**mod.module_sym_imports, **tl.sym_imports}.items():
            if local in tl.refs and src in taint and orig in taint[src]:
                return True
        for m2 in tl.mod_imports:  # `from pkg.a import b_module` / `import pkg.a`
            if m2 in taint and (tl.refs & taint[m2]):
                return True
        return False

    grew = True
    while grew:
        grew = False
        for mod in mods.values():
            for tl in mod.toplevels:
                already = (
                    next(iter(tl.names)) in attr_taint
                    or tl.owner in taint[mod.name]
                    if tl.owner
                    else tl.names <= taint[mod.name]
                )
                if tl.names and not already and tainted_via(tl, mod):
                    grew |= taint_unit(tl, mod)
    return taint, attr_taint


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default=None)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    base = args.base or default_base()

    mods = package_modules()
    qmod = mods[f"{PKG}.queries"]
    taint, attr_taint = compute_taint(base, mods)
    qtaint = taint[qmod.name]

    reasons: dict[str, str] = {}
    for qname, parts in qmod.registry.items():
        hit = [p for p in parts if p in qtaint]
        if hit:
            reasons[qname] = f"tainted: {hit}"

    failures = []
    window_in_registry = [w for w in qmod.window if w in qmod.registry]
    if len(window_in_registry) != WINDOW_SIZE:
        failures.append(
            f"front window has {len(window_in_registry)} registry names, "
            f"expected {WINDOW_SIZE}"
        )
    certified = set(window_in_registry[:WINDOW_SIZE])
    outside = sorted(set(reasons) - certified)
    for q in outside:
        failures.append(f"tainted query outside window: {q} ({reasons[q]})")

    n_tainted_defs = sum(len(v) for v in taint.values())
    print(
        f"base={base[:12]} tainted_defs={n_tainted_defs} "
        f"tainted_queries={len(reasons)}/{len(qmod.registry)}"
    )
    if args.list or failures:
        for q in sorted(reasons):
            mark = "OUT" if q in outside else "in "
            print(f"  [{mark}] {q}: {reasons[q]}")
    if failures:
        print("FAIL:")
        for f in failures:
            print(f"  {f}")
        return 1
    print("OK: all tainted queries are inside the front window")
    return 0


if __name__ == "__main__":
    sys.exit(main())
