#!/usr/bin/env python
"""Registry-wide broadcast-hint classification audit (r11).

``F.broadcast()`` is a FORCE hint: it overrides AQE's size logic, so a
hint on a frame that grows with the data is a guaranteed driver OOM at
some scale while passing at every test SF. The r10 audit un-hinted 12
such sites by hand; this tool makes the remaining classification
mechanical and PERMANENT:

STATIC GATE (``--static``, also run by tests/test_hint_audit.py):
  every ``F.broadcast(`` call site inside ``hbase_support_spark/``
  must carry a same-line structured tag::

      F.broadcast(med)  # bcast: scalar

  whose kind comes from the bounded-by-construction taxonomy below.
  Any untagged or unknown-kind site FAILS the audit, so a future
  data-scale hint cannot land unproven.

EMPIRICAL GATE (``--measure SF_DIR [SF_DIR2]``):
  monkeypatches ``pyspark.sql.functions.broadcast`` to record, for
  every call site actually reached while CONSTRUCTING all registry
  queries, the broadcast frame's row count (construction is eager in
  this package, so building the DataFrame triggers every hint without
  executing the final query). Run at two scales and any site whose
  row count grows super-constantly (ratio > GROWTH_LIMIT across a 10x
  data scale-up) is flagged — the empirical check that the static tag
  told the truth. Results land in HINT_AUDIT_r12.json.

Taxonomy — every kind is bounded by CONSTRUCTION, i.e. its row count
is fixed by a constant in the code or by a fixed schema domain, never
by the data volume:

  scalar      global aggregate, no/fixed groupBy -> 1 row (or a
              handful, one per fixed literal)
  dim         fixed dimension table: region (5), nation (25) -- size
              set by the schema/spec, not the SF
  enum        distinct over a fixed categorical domain (order status,
              line status, event_type, flag) -- domain is a code- or
              spec-level constant
  topk        explicit .limit(K) / top-K result, K a code constant
  centroids   clustering/IVF centroids, K fixed by parameter
  lexicon     driver-literal wordlist / config / createDataFrame of
              constants
  grid        fixed evaluation grid (percentile targets, histogram
              bin edges, date spine bounded by a constant window)
  keys        an explicitly capped key list (e.g. sampled/multi-get
              key set of constant length)
  verb        THE broadcast-join demo row itself (join_broadcast):
              the hint is the demonstrated operator, precondition
              documented in its docstring. Allowed ONLY in
              operators/joins.py; exempt from growth/cap checks.

Growth policy: every kind except `grid`/`verb` must be FLAT across a
10x scale-up (ratio <= GROWTH_LIMIT) -- a "dim" that doubles with SF
is a mis-tagged fact. `grid` frames (fixed cross-domain grids: CMS
j x slot, class x band) legitimately FILL their domain as data grows,
so they are exempt from the growth check but get a tight row cap
(the domain product is a code constant).

Anything else -- degree tables, vocab DF, cohorts, per-entity stats,
SF-scale TPC-H part/supplier -- is NOT broadcastable by hint; leave
it to AQE (r11 un-hinted 21 such sites; see
tests/test_broadcast_hints.py for pinned un-hinted sites).
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import tokenize
from collections import defaultdict

PKG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "hbase_support_spark")
REPO = os.path.dirname(PKG_DIR)

KINDS = {"scalar", "dim", "enum", "topk", "centroids", "lexicon", "grid",
         "keys", "verb"}
# kinds exempt from the flat-growth requirement (domain-fill / demo)
GROWTH_EXEMPT = {"grid", "verb"}
# `verb` is the broadcast-join §2 demo; one module only
VERB_FILES = {"hbase_support_spark/operators/joins.py"}

# A site tagged with kind K must stay under these row counts at ANY
# scale (checked empirically in --measure). The caps are generous --
# they bound "could this frame ever OOM a driver", not "is it tiny".
KIND_CAPS = {
    "scalar": 64,
    "dim": 1_000,
    "enum": 2_000,
    "topk": 100_000,
    "centroids": 65_536,
    "lexicon": 100_000,
    "grid": 8_192,
    "keys": 100_000,
    "verb": None,  # exempt (documented precondition at the demo site)
}
# Max allowed count ratio between two SFs that differ 10x in volume.
# Bounded frames are flat; 3x absorbs sampling noise (e.g. an enum
# domain only partially present at the smaller SF).
GROWTH_LIMIT = 3.0

TAG_RE = re.compile(r"#\s*bcast:\s*([a-z]+)\b")


def _py_files():
    for root, _dirs, files in os.walk(PKG_DIR):
        for f in sorted(files):
            if f.endswith(".py"):
                yield os.path.join(root, f)


def scan_static():
    """Yield (file, line, tag_or_None) for every F.broadcast( site."""
    sites = []
    for path in _py_files():
        with open(path, encoding="utf-8") as fh:
            lines = fh.readlines()
        for i, line in enumerate(lines, start=1):
            for m in re.finditer(r"\bF\.broadcast\(", line):
                tag = TAG_RE.search(line)
                sites.append((os.path.relpath(path, REPO), i,
                              tag.group(1) if tag else None))
    return sites


def run_static(verbose=True):
    sites = scan_static()
    bad = [(f, l, t) for (f, l, t) in sites
           if t is None or t not in KINDS
           or (t == "verb" and f not in VERB_FILES)]
    by_kind = defaultdict(int)
    for _f, _l, t in sites:
        if t in KINDS:
            by_kind[t] += 1
    if verbose:
        print(f"{len(sites)} F.broadcast sites; kinds: "
              + ", ".join(f"{k}={v}" for k, v in sorted(by_kind.items())))
        for f, l, t in bad:
            print(f"UNCLASSIFIED {f}:{l} tag={t!r}")
        print(("FAIL" if bad else "PASS") + " static hint audit")
    return sites, bad


def _site_tags():
    return {(f, l): t for (f, l, t) in scan_static()}


def measure(sf_dir):
    """Construct every registry query with a recording broadcast()."""
    sys.path.insert(0, REPO)
    import pyspark.sql.functions as SF
    from hbase_support_spark import QUERIES, load_all
    from hbase_support_spark.session import get_spark

    load_all()
    spark = get_spark()
    real = SF.broadcast
    counts = {}          # (relfile, line) -> max rows observed
    site_queries = defaultdict(set)
    current = {"q": None}
    depth = {"n": 0}     # suppress recursion: count() under a patched call

    def rec(df):
        if depth["n"]:
            return real(df)
        fr = sys._getframe(1)
        site = None
        while fr is not None:
            fn = fr.f_code.co_filename
            if fn.startswith(PKG_DIR):
                site = (os.path.relpath(fn, REPO), fr.f_lineno)
                break
            fr = fr.f_back
        if site is None:
            return real(df)
        depth["n"] += 1
        try:
            n = df.count()
        finally:
            depth["n"] -= 1
        counts[site] = max(counts.get(site, 0), n)
        site_queries[site].add(current["q"])
        return real(df)

    SF.broadcast = rec
    errs = {}
    try:
        for name in sorted(QUERIES):
            current["q"] = name
            try:
                QUERIES[name](spark, sf_dir)
            except Exception as e:  # constructing only; record, keep going
                errs[name] = f"{type(e).__name__}: {e}"[:200]
    finally:
        SF.broadcast = real
    return counts, site_queries, errs


def _resolve_site(tags, site):
    """Anchor a RUNTIME broadcast site to its static-scan site. A
    multi-line ``F.broadcast(...)`` expression can report any line of
    the enclosing statement as ``f_lineno`` depending on the Python
    version, while the ``# bcast:`` tag rides the line with the call
    token — exact-line lookup would flag a correctly-tagged site as a
    violation (ADVICE r11). Fall back to the NEAREST static site in
    the same file within a statement-sized window."""
    if site in tags:
        return site
    f, l = site
    near = [(abs(sl - l), (sf, sl)) for (sf, sl) in tags
            if sf == f and abs(sl - l) <= 8]
    if near:
        return min(near)[1]
    return site


def run_measure(sf_dirs, out_path):
    tags = _site_tags()
    runs = {}
    all_queries = defaultdict(set)
    for sf in sf_dirs:
        print(f"measuring {sf} ...", flush=True)
        counts, site_queries, errs = measure(sf)
        runs[sf] = {}
        for s, n in counts.items():
            anchor = _resolve_site(tags, s)
            runs[sf][anchor] = max(runs[sf].get(anchor, 0), n)
        for s, qs in site_queries.items():
            all_queries[_resolve_site(tags, s)] |= {q for q in qs if q}
        if errs:
            print(f"  {len(errs)} construction errors: {sorted(errs)[:5]}")
    sites = sorted(set().union(*[set(c) for c in runs.values()]))
    report, violations = [], []
    for site in sites:
        f, l = site
        tag = tags.get(site)
        per_sf = {sf: runs[sf].get(site) for sf in sf_dirs}
        vals = [v for v in per_sf.values() if v is not None]
        cap = KIND_CAPS.get(tag, 0)
        over_cap = bool(vals) and cap is not None and max(vals) > cap
        growth = (max(vals) / max(1, min(vals))) if len(vals) > 1 else 1.0
        grows = (tag not in GROWTH_EXEMPT and len(vals) > 1
                 and max(vals) > 32 and growth > GROWTH_LIMIT)
        row = {"file": f, "line": l, "kind": tag, "rows": per_sf,
               "growth": round(growth, 2), "over_cap": over_cap,
               "grows": grows,
               "queries": sorted(all_queries.get(site, []))[:6]}
        report.append(row)
        if over_cap or grows or tag not in KINDS:
            violations.append(row)
    result = {"sf_dirs": sf_dirs, "n_sites_hit": len(sites),
              "n_sites_static": len(tags), "violations": violations,
              "sites": report}
    with open(out_path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"{len(sites)} sites measured ({len(tags)} static); "
          f"{len(violations)} violations -> {out_path}")
    for v in violations:
        print("VIOLATION", v["file"] + ":" + str(v["line"]),
              v["kind"], v["rows"], "growth", v["growth"])
    return 1 if violations else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    if args[:1] == ["--static"] or not args:
        _sites, bad = run_static()
        sys.exit(1 if bad else 0)
    if args[:1] == ["--measure"]:
        sfs = args[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
        out = os.environ.get("HINT_AUDIT_OUT",
                             os.path.join(REPO, "HINT_AUDIT_r12.json"))
        sys.exit(run_measure(sfs, out))
    print(__doc__)
    sys.exit(2)
