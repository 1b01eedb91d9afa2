"""window_lint is part of the round's final check — keep its parser and
taint machinery from silently breaking as queries.py grows."""

from __future__ import annotations

import subprocess
import sys

import tools.window_lint as wl


def test_head_base_passes():
    """Diffing against HEAD (uncommitted work only) must pass: any taint
    from work-in-progress is inside the front window, and the window holds
    exactly 50 registry names. (Zero taint is NOT asserted — the tree may
    legitimately carry uncommitted, already-windowed work.)"""
    rc = subprocess.run(
        [sys.executable, "tools/window_lint.py", "--base", "HEAD"],
        capture_output=True, text=True,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
    assert "OK: all tainted queries are inside the front window" in rc.stdout


def test_registry_and_window_parse():
    mods = wl.package_modules()
    q = mods["simtradedata_spark.queries"]
    assert len(q.registry) >= 170
    window_in_registry = [w for w in q.window if w in q.registry]
    assert len(window_in_registry) == wl.WINDOW_SIZE
    # every registry entry resolves its (query fn, SQL) to top-level names
    assert all(all(p for p in parts) for parts in q.registry.values())


def test_method_granularity_isolated():
    """A method unit binds exactly one name and scans only its own body;
    the owning ClassDef unit must NOT reference names that appear only
    inside method bodies (the round-6 flood regression)."""
    mods = wl.package_modules()
    syn = mods["simtradedata_spark.sources.synthetic"]
    cls = next(
        tl for tl in syn.toplevels
        if not tl.owner and tl.names == {"SyntheticMarket"}
    )
    methods = [tl for tl in syn.toplevels if tl.owner == "SyntheticMarket"]
    assert any(next(iter(m.names)) == "fundamentals" for m in methods)
    # STATEMENT_FIELDS is referenced only inside fundamentals(); the class
    # unit seeing it would re-create the whole-class taint flood
    assert "STATEMENT_FIELDS" not in cls.refs
