"""Fixture identity contract — which keys the engine may use as
determinism spines (r9, after the skew-drill tie-spine catch).

The engine's windows, ranks, and argmin seams break ties on
row-identity keys. Those keys are only as good as the fixture
generator's guarantees, and the generator does NOT promise what
TPC-H proper would: lineitem (l_orderkey, l_linenumber) repeats
freely (14k duplicate pairs at sf0.01, 8 still duplicated with
l_shipdate attached) — three rolling windows rode that spine for
nine rounds on partition-placement luck until the hot-key skew
drill collided them. This module pins the contract both ways:

  * keys the engine MAY use as unique tie-breaks stay unique;
  * lineitem's pseudo-keys stay documented as NON-unique, so a
    future session doesn't quietly re-assume them (a lineitem
    ORDER BY must instead be value-invariant: append every column
    the window reads, making tied rows interchangeable — see
    windows.py win_anchored_vwap).

If the driver's generator ever changes either direction, this fails
before a graded query does.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

UNIQUE_SPINES = {
    "events": "event_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


@pytest.mark.parametrize("table,key", sorted(UNIQUE_SPINES.items()))
def test_unique_spines_stay_unique(con, table, key):
    dups = con.execute(
        f"SELECT count(*) - count(DISTINCT {key}) "
        f"FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).fetchone()[0]
    assert dups == 0, f"{table}.{key} is no longer a unique tie-break spine"


def test_lineitem_has_no_row_id():
    """lineitem carries NO unique key — neither (orderkey,
    linenumber) nor (shipdate, orderkey, linenumber) may be treated
    as one. If the generator starts making them unique, surface it:
    the value-invariant sort spellings stay correct either way, but
    the contract note should be revisited."""
    con = duckdb.connect()
    dups = con.execute(
        "SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) "
        f"FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchone()[0]
    assert dups > 0, (
        "lineitem (l_orderkey, l_linenumber) became unique — update "
        "the fixture contract note in this module and windows.py"
    )
