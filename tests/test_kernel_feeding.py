"""Kernel-feeding contract — static registry-wide audit (r8).

The r7 ×128 audit caught ``agg_quantile_exact_global`` feeding RAW
ROWS into the rank kernel: every kernel in ``operators/ranking.py``
``localCheckpoint``s its range-partitioned input, so a row-scale feed
makes the materialization input-scale and OOMs where the query's own
shuffles would not (OOM at ×128 in the 8 g envelope; 3.5 s after the
grid rewrite). The contract written into ranking.py's docstring:

    Feed the smallest sufficient frame — hash-aggregate to the
    distinct value grid (or entity aggregate) first; raw-row feeds
    are right only when the per-row rank itself is the output.

That contract lived in a docstring plus one manual audit. This test
makes it structural (VERDICT r07 item 3): the three kernels are
wrapped to record every input DataFrame the registry feeds them, and
each recorded input must show reduction evidence in its analyzed
logical plan — an Aggregate / Deduplicate / Limit (a grid, entity
aggregate, or survivor frame), or a LogicalRDD (the output of a
previous, already-audited kernel in a chain) — with reduction on the
BROADCAST side of a hinted join not counting (same blind spot the r8
funnel-audit fix closed). Raw-row feeds must be explicitly justified
in ``RAW_ROW_JUSTIFIED`` below, which doubles as the reviewable
ledger of every per-row-output kernel use in the engine.

A future op that checkpoints row-scale input into the kernels either
shows an Aggregate in its feed or forces its author to write a
justification line here — the failure mode is loud either way.
"""

from __future__ import annotations

import pytest
from py4j.protocol import Py4JError

from hbase_support_spark import QUERIES, load_all
from hbase_support_spark.operators import ranking

load_all()

_KERNELS = ("with_global_rank", "with_global_prefix_sum", "with_global_prefix_max")

# Query name -> why a raw-row (un-aggregated) kernel feed is correct
# there: the per-row rank/cumulative IS the query's output, and the
# frame is already the smallest sufficient one (no grid exists).
RAW_ROW_JUSTIFIED: dict[str, str] = {
    "agg_weighted_median": (
        "second kernel call: rows AT the median price point, unique per "
        "(orderkey, linenumber) — no grid to reduce to; the per-row "
        "cumulative weight is what the crossing predicate consumes"
    ),
    "layout_clustering_factor_audit": (
        "per-row global positions of orders under two sort orders ARE "
        "the clustering-factor measurement; rows are the entities"
    ),
    "pipeline_preference_pairs": (
        "per-document quality rank within language drives the pairing; "
        "one row per document is already the entity grain"
    ),
    "pipeline_token_budget_plan": (
        "per-document cumulative token count IS the budget walk; one "
        "row per document is the entity grain"
    ),
    "pipeline_curriculum_order": (
        "per-document difficulty rank drives the NTILE(4) stage cut; "
        "one row per document is the entity grain (documents are the "
        "units being ordered — no grid exists over the x100 proxy that "
        "would be smaller than the doc frame at the fixture's scale, "
        "and the stage id must attach back to each doc's token budget)"
    ),
    "sample_negative_pairs": (
        "per-document hash rank IS the shuffle position the stride "
        "pairing indexes; entity grain"
    ),
    "sample_systematic_kth": (
        "per-row global position over orders IS the systematic-sample "
        "selector (rank mod k); the sample never materializes separately"
    ),
    "sim_rerank_rrf": (
        "per-candidate retriever rank IS the RRF input; the dense/"
        "lexical score frames are one row per candidate document"
    ),
    "win_cume_percent_nth": (
        "per-row rank feeds the arithmetic CUME_DIST/PERCENT_RANK "
        "restatement — the per-row window value IS the output"
    ),
    "win_rank_dense_ntile": (
        "per-row rank feeds the arithmetic RANK/DENSE_RANK/NTILE "
        "restatement — the per-row window value IS the output"
    ),
}


def _children(node):
    cs = node.children()
    return [cs.apply(i) for i in range(cs.length())]


def _is_reduced(df) -> bool:
    """True if the analyzed logical plan shows the frame was reduced
    below row scale before reaching the kernel. Branches under a
    broadcast ResolvedHint are skipped — an Aggregate on the tiny
    broadcast side says nothing about the probe rows the kernel
    would checkpoint."""
    plan = df._jdf.queryExecution().analyzed()
    stack = [plan]
    while stack:
        n = stack.pop()
        nn = n.nodeName()
        if (
            "Aggregate" in nn
            or "Deduplicate" in nn
            or "Distinct" in nn
            or "Limit" in nn
            or "LogicalRDD" in nn
        ):
            return True
        for c in _children(n):
            cn = c.nodeName()
            if "ResolvedHint" in cn and "broadcast" in c.simpleString(200).lower():
                continue
            stack.append(c)
    return False


@pytest.fixture()
def kernel_recorder(monkeypatch):
    """Wrap the three ranking kernels to record every input frame."""
    recorded: list[tuple[str, object]] = []

    def _wrap(name, orig):
        def inner(df, *args, **kwargs):
            recorded.append((name, df))
            return orig(df, *args, **kwargs)

        return inner

    for k in _KERNELS:
        monkeypatch.setattr(ranking, k, _wrap(k, getattr(ranking, k)))
    return recorded


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_kernel_inputs_reduced_or_justified(name, spark, sf_dir, kernel_recorder):
    try:
        QUERIES[name](spark, sf_dir)  # plan build only — kernels fire here
    except Py4JError:  # pragma: no cover - plan build must not flake silently
        raise
    bad = []
    for kname, df in kernel_recorder:
        if not _is_reduced(df) and name not in RAW_ROW_JUSTIFIED:
            bad.append(f"{kname} fed an un-reduced row-scale frame")
    assert not bad, (
        f"{name}: {bad} — kernels localCheckpoint their input, so feed "
        f"the distinct-value grid / entity aggregate (ranking.py feeding "
        f"contract), or add a justification to RAW_ROW_JUSTIFIED"
    )


def test_kernel_audit_positive_control(spark, sf_dir, kernel_recorder):
    """The audit must actually see kernel calls and flag raw feeds —
    guard against the wrapper or plan accessors silently no-opping."""
    from hbase_support_spark.io import load_table
    from hbase_support_spark.operators.ranking import with_global_rank

    o = load_table(spark, sf_dir, "orders")
    # NB: call through the module attribute so the monkeypatch records it
    ranking.with_global_rank(o, ["o_orderkey"], "r")
    assert kernel_recorder, "recorder saw no kernel call"
    kname, df = kernel_recorder[-1]
    assert not _is_reduced(df), "raw orders scan must read as un-reduced"
    grid = o.groupBy("o_orderstatus").agg({"*": "count"})
    assert _is_reduced(grid), "an Aggregate grid must read as reduced"
    assert with_global_rank is not None
