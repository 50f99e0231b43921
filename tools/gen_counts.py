#!/usr/bin/env python
"""Stamp registry-derived counts into the prose docs (r11).

VERDICT r10: SCALE.md said "114 queries" three hundred queries after
that was true — hand-typed totals rot. This tool rewrites every
`<!-- registry-count -->`-marked number from `len(QUERIES)`;
tests/test_doc_counts.py asserts the docs agree with the registry, so
the suite fails the moment prose and code diverge.

Marked pattern (the marker comment sits at the end of the line whose
number is stamped):

    ... all 428 registry queries ... <!-- registry-count -->
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS = ["SCALE.md", "COVERAGE.md"]
MARK = "<!-- registry-count -->"
NUM_RE = re.compile(r"\b\d+(?= (?:registry )?quer(?:y|ies))")


def registry_count() -> int:
    from hbase_support_spark import QUERIES, load_all

    load_all()
    return len(QUERIES)


def stamp(write: bool = True) -> list[str]:
    n = registry_count()
    stale = []
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        with open(path, encoding="utf-8") as fh:
            lines = fh.readlines()
        changed = False
        for i, line in enumerate(lines):
            if MARK not in line:
                continue
            new = NUM_RE.sub(str(n), line)
            if new != line:
                stale.append(f"{doc}:{i + 1}: {line.strip()!r} -> {n}")
                lines[i] = new
                changed = True
        if write and changed:
            with open(path, "w", encoding="utf-8") as fh:
                fh.writelines(lines)
    return stale


def check() -> list[str]:
    """Return mismatch descriptions without writing (for the test)."""
    n = registry_count()
    bad = []
    n_marks = 0
    for doc in DOCS:
        path = os.path.join(REPO, doc)
        with open(path, encoding="utf-8") as fh:
            for i, line in enumerate(fh, start=1):
                if MARK not in line:
                    continue
                n_marks += 1
                m = NUM_RE.search(line)
                if not m:
                    bad.append(f"{doc}:{i}: marker without a count")
                elif int(m.group(0)) != n:
                    bad.append(f"{doc}:{i}: says {m.group(0)}, registry has {n}")
    if n_marks == 0:
        bad.append("no registry-count markers found in any doc")
    return bad


if __name__ == "__main__":
    if "--check" in sys.argv:
        problems = check()
        for p in problems:
            print(p)
        sys.exit(1 if problems else 0)
    changed = stamp()
    for c in changed:
        print(c)
    print(f"registry={registry_count()}; {len(changed)} line(s) restamped")
