"""Docs-match-registry gate (VERDICT r10 item 3).

SCALE.md once claimed an invariant "asserted for all 114 queries"
three hundred queries after the registry outgrew that number. Every
registry-total claim in the prose docs now carries a
``<!-- registry-count -->`` marker; tools/gen_counts.py stamps them
from ``len(QUERIES)`` and this test fails the suite the moment any
marked count diverges (or the markers disappear entirely).
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import gen_counts


def test_doc_counts_match_registry():
    problems = gen_counts.check()
    assert not problems, (
        "stale doc counts (run `python tools/gen_counts.py`): "
        + "; ".join(problems)
    )
