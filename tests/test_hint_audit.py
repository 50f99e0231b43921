"""Registry-wide broadcast-hint classification gate (VERDICT r10 #1).

Every ``F.broadcast(`` site in the package must carry a same-line
``# bcast: <kind>`` tag from the bounded-by-construction taxonomy in
tools/hint_audit.py. An untagged or unknown-kind hint FAILS here, so
a future data-scale force-hint (the 100-TB driver-OOM class the
r10/r11 audits purged — 12 sites in r10, 26 more in r11) cannot land
unproven. The empirical side (two-scale row-count measurement per
site) is tools/hint_audit.py --measure, recorded in
HINT_AUDIT_r11.json.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import hint_audit


def test_every_broadcast_site_is_classified():
    sites, bad = hint_audit.run_static(verbose=False)
    assert sites, "scan found no broadcast sites — scanner broken?"
    assert not bad, (
        "unclassified F.broadcast sites (tag `# bcast: <kind>` with a "
        f"kind from tools/hint_audit.py KINDS, or un-hint): {bad}"
    )


def test_verb_kind_is_unique_to_the_demo_row():
    sites, _bad = hint_audit.run_static(verbose=False)
    verbs = [(f, l) for (f, l, t) in sites if t == "verb"]
    assert len(verbs) == 1 and verbs[0][0].endswith("operators/joins.py"), (
        "`verb` (hint-is-the-operator) is reserved for the single "
        f"join_broadcast demo site; found {verbs}"
    )


def test_taxonomy_caps_cover_all_kinds():
    assert set(hint_audit.KIND_CAPS) == hint_audit.KINDS
    assert hint_audit.GROWTH_EXEMPT <= hint_audit.KINDS
