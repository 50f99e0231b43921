"""§2.2 Projection / filter / predicate pushdown.

Maps the HBase filter hierarchy (SingleColumnValueFilter, FilterList,
RegexStringComparator, MultiRowRangeFilter, KeyOnly/FirstKeyOnly,
PageFilter — public client API, SURVEY.md §2.2) onto declarative
Column predicates so Catalyst pushes them into the Parquet scan.

Scale notes: every query here compiles to a single scan stage with
PushedFilters + pruned ReadSchema — no shuffle except `keys_only`
(distinct) and none of them ever materializes unneeded columns.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register


@register(
    "project_prune",
    oracle="SELECT l_orderkey, l_extendedprice FROM lineitem",
)
def project_prune(spark, sf_dir):
    """addFamily/addColumn qualifier selection → column pruning; the
    Parquet ReadSchema contains exactly these two columns."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")


@register(
    "filter_value",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem WHERE l_quantity > 45
    """,
)
def filter_value(spark, sf_dir):
    """SingleColumnValueFilter(cf, q, GREATER, 45)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


@register(
    "filter_list_and_or",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus, l_discount
    FROM lineitem
    WHERE (l_returnflag = 'A' AND l_discount > 0.05)
       OR (l_linestatus = 'F' AND NOT l_quantity > 10)
    """,
)
def filter_list_and_or(spark, sf_dir):
    """FilterList(MUST_PASS_ALL / MUST_PASS_ONE) — a boolean tree of
    predicates; Catalyst folds it into one pushed disjunction."""
    li = load_table(spark, sf_dir, "lineitem")
    p1 = (F.col("l_returnflag") == "A") & (F.col("l_discount") > 0.05)
    p2 = (F.col("l_linestatus") == "F") & ~(F.col("l_quantity") > 10)
    return li.filter(p1 | p2).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus", "l_discount"
    )


@register(
    "filter_regex",
    oracle=r"""
    SELECT c_custkey, c_name
    FROM customer
    WHERE regexp_matches(c_name, 'Customer#0+1[0-9]{2}$')
    """,
)
def filter_regex(spark, sf_dir):
    """RegexStringComparator / FuzzyRowFilter → rlike (keep to syntax
    shared by Java regex and RE2 so engines agree)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_name").rlike(r"Customer#0+1[0-9]{2}$")).select(
        "c_custkey", "c_name"
    )


@register(
    "filter_in_ranges",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE (o_orderkey BETWEEN 100 AND 200)
       OR (o_orderkey BETWEEN 1000 AND 1100)
       OR (o_orderkey BETWEEN 5000 AND 5050)
    """,
)
def filter_in_ranges(spark, sf_dir):
    """MultiRowRangeFilter — OR of disjoint rowkey ranges; each range
    still prunes row groups independently."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.filter(
        k.between(100, 200) | k.between(1000, 1100) | k.between(5000, 5050)
    ).select("o_orderkey", "o_totalprice")


@register(
    "filter_null_safe",
    oracle="""
    SELECT
      l_orderkey,
      l_linenumber,
      flag_or_null,
      (flag_or_null IS NULL) AS is_absent,
      (flag_or_null IS NOT DISTINCT FROM 'A') AS null_safe_eq_a
    FROM (
      SELECT l_orderkey, l_linenumber, NULLIF(l_returnflag, 'N') AS flag_or_null
      FROM lineitem
    )
    WHERE l_orderkey < 100
    """,
)
def filter_null_safe(spark, sf_dir):
    """Qualifier-absent vs empty-value distinction: NULL handling with
    the null-safe equality operator (<=> / IS NOT DISTINCT FROM)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    flag = F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null")
    return li.select("l_orderkey", "l_linenumber", flag).select(
        "l_orderkey",
        "l_linenumber",
        "flag_or_null",
        F.col("flag_or_null").isNull().alias("is_absent"),
        F.col("flag_or_null").eqNullSafe(F.lit("A")).alias("null_safe_eq_a"),
    )


@register(
    "keys_only",
    oracle="SELECT DISTINCT l_orderkey FROM lineitem",
)
def keys_only(spark, sf_dir):
    """KeyOnlyFilter/FirstKeyOnlyFilter — rowkeys without values.
    Reads exactly one column (pruned scan) then a partial-agg distinct."""
    return load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct()


@register(
    "page_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_orderkey LIMIT 100
    """,
)
def page_limit(spark, sf_dir):
    """PageFilter(n) / Scan.setLimit — order-stabilized on the unique
    key so the limited set is deterministic for grading. Physical plan
    is TakeOrderedAndProject (per-partition top-k + merge), not a full
    sort."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy("o_orderkey").limit(100)
