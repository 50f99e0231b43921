"""The linecache session-start pin (VERDICT r10 item 8).

conftest._pin_linecache freezes package sources into linecache with
mtime=None entries so `inspect.getsource` in the source-pin tests
reads the session-start snapshot, immune to concurrent .py edits
(r10 saw 11 artifact failures from exactly that). These tests prove
the mechanism on a throwaway module and that the package pin is in
place.
"""

from __future__ import annotations

import importlib.util
import inspect
import linecache
import os
import sys

import conftest


def test_pin_survives_mid_run_edit(tmp_path):
    p = tmp_path / "pinned_mod.py"
    p.write_text("def f():\n    return 1\n")
    spec = importlib.util.spec_from_file_location("pinned_mod", p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["pinned_mod"] = spec.loader.exec_module(mod) or mod
    try:
        # the conftest pin, replicated for this file
        lines = p.read_text().splitlines(keepends=True)
        linecache.cache[str(p)] = (sum(map(len, lines)), None, lines, str(p))
        before = inspect.getsource(mod.f)
        # the hazard: shift every line number mid-run
        p.write_text("# edited while the suite runs\n\n\ndef f():\n    return 2\n")
        linecache.checkcache(str(p))  # what a traceback/getsource may trigger
        after = inspect.getsource(mod.f)
        assert after == before == "def f():\n    return 1\n"
    finally:
        sys.modules.pop("pinned_mod", None)
        linecache.cache.pop(str(p), None)


def test_package_sources_are_pinned():
    import hbase_support_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    sample = [
        os.path.join(pkg_dir, "registry.py"),
        os.path.join(pkg_dir, "operators", "aggregates.py"),
        os.path.join(pkg_dir, "operators", "llm.py"),
    ]
    for path in sample:
        entry = linecache.cache.get(path)
        assert entry is not None, f"{path} not pinned at session start"
        assert entry[1] is None, f"{path} pin is mtime-invalidatable"
    assert conftest is not None
