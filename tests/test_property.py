"""Property-based differential tests (SURVEY.md §5.4): Spark and
DuckDB must agree cell-wise on scalar function families over
*generated* inputs, not just the fixture domains.

One Spark job per hypothesis case would be minutes-slow; instead each
property draws a whole batch of rows, runs both engines once, and
compares cell-wise.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=0,
    max_size=24,
)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=24))
def test_string_fn_parity(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, ["id", "a", "b"])
    got = {
        r.id: (r.lev, r.cat, r.low, r.ln)
        for r in df.select(
            "id",
            F.levenshtein("a", "b").alias("lev"),
            F.concat_ws("|", "a", "b").alias("cat"),
            F.lower("a").alias("low"),
            F.length("b").alias("ln"),
        ).collect()
    }
    con = duckdb.connect()
    for i, a, b in rows:
        lev, cat, low, ln = con.execute(
            "SELECT levenshtein(?, ?), concat_ws('|', ?, ?), lower(?), length(?)",
            [a, b, a, b, a, b],
        ).fetchone()
        assert got[i] == (lev, cat, low, ln), (a, b, got[i], (lev, cat, low, ln))


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=32,
    )
)
def test_math_fn_parity(spark, xs):
    rows = [(i, float(x)) for i, x in enumerate(xs)]
    df = spark.createDataFrame(rows, ["id", "x"])
    got = {
        r.id: (r.ab, r.sg, r.rd)
        for r in df.select(
            "id",
            F.abs("x").alias("ab"),
            F.signum("x").alias("sg"),
            F.round("x", 3).alias("rd"),
        ).collect()
    }
    con = duckdb.connect()
    for i, x in rows:
        ab, sg, rd = con.execute(
            "SELECT abs(?), sign(?)::DOUBLE, round(?, 3)", [x, x, x]
        ).fetchone()
        assert got[i][0] == ab and got[i][1] == sg, (x, got[i])
        # round: both half-away-from-zero; ties at 1e-3 are exact here
        assert abs(got[i][2] - rd) < 1e-9, (x, got[i][2], rd)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=32))
def test_hash_digest_parity(spark, keys):
    """md5 over decimal-string keys must agree byte-for-byte."""
    rows = [(i, str(k)) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, ["id", "k"])
    got = {r.id: r.h for r in df.select("id", F.md5("k").alias("h")).collect()}
    con = duckdb.connect()
    for i, k in rows:
        assert got[i] == con.execute("SELECT md5(?)", [k]).fetchone()[0]


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e7, max_value=1e7, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=64,
    )
)
def test_money_sum_parity_and_exactness(spark, xs):
    """The num.py cents contract: money_sum == DuckDB d_money_sum ==
    a Python model summing floor(x*100 + 0.5) as exact ints — for
    arbitrary signed doubles, any accumulation order."""
    import math

    import duckdb as _duckdb

    from hbase_support_spark.num import d_money_sum, money_sum

    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    got = df.agg(money_sum("v").alias("s")).collect()[0].s
    con = _duckdb.connect()
    con.execute("CREATE TABLE t (v DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    oracle = con.execute(f"SELECT {d_money_sum('v')} FROM t").fetchone()[0]
    model = sum(int(math.floor(x * 100 + 0.5)) for x in xs) / 100.0
    assert got == oracle == model, (xs, got, oracle, model)


@settings(max_examples=50, deadline=None)
@given(st.integers(min_value=1, max_value=5000), st.integers(min_value=1, max_value=64))
def test_ntile_formula_matches_sql_ntile(n, k):
    """ntile_from_rank's closed form must equal SQL NTILE(k) for every
    (rank, n): first n%k tiles get n//k+1 rows, the rest n//k —
    checked against DuckDB's NTILE over an n-row sequence. Pure
    arithmetic (no Spark job), so hypothesis can sweep widely."""
    import duckdb

    want = dict(
        duckdb.sql(
            f"SELECT r, NTILE({k}) OVER (ORDER BY r) FROM range(1, {n + 1}) t(r)"
        ).fetchall()
    )
    base, extra = n // k, n % k
    cut = (base + 1) * extra
    for r in range(1, n + 1):
        if r <= cut:
            tile = -(-r // (base + 1))
        else:
            tile = extra + -(-(r - cut) // base)
        assert tile == want[r], (n, k, r, tile, want[r])


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6), min_size=2, max_size=12
    )
)
def test_deletion_neighborhood_finds_all_distance1_pairs(strings):
    """FastSS completeness/soundness (join_er_fuzzy_string's kernel):
    over a low-alphabet corpus rich in near-misses, the deletion-
    neighborhood candidate set must be EXACTLY the equal-length
    Levenshtein-distance-1 pairs — each found exactly once (the
    single-collision property the join relies on to skip dedup)."""
    strings = list(dict.fromkeys(strings))  # unique corpus

    def lev1_same_len(a, b):
        if len(a) != len(b) or a == b:
            return False
        return sum(x != y for x, y in zip(a, b)) == 1

    want = {
        (i, j)
        for i in range(len(strings))
        for j in range(i + 1, len(strings))
        if lev1_same_len(strings[i], strings[j])
    }
    got = []
    index = {}
    for i, s in enumerate(strings):
        for p in range(len(s)):
            key = (p, s[:p] + s[p + 1 :])
            for j in index.get(key, []):
                if strings[j] != s:
                    got.append((min(i, j), max(i, j)))
            index.setdefault(key, []).append(i)
    assert sorted(got) == sorted(want), (strings, sorted(got), sorted(want))
    assert len(got) == len(set(got)), "a pair collided at more than one position"


from hypothesis import given, settings, strategies as st


@given(
    st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=60
    )
)
@settings(max_examples=200, deadline=None)
def test_drawdown_invariants(flows):
    """Pure-python restatement of the win_max_drawdown kernel: the
    drawdown is non-negative, bounded by peak range, zero for a
    monotone non-decreasing curve, and equals the classic two-pass
    definition."""
    cum, peak, dd = 0, -(10**18), 0
    curve = []
    for f in flows:
        cum += f
        peak = max(peak, cum)
        dd = max(dd, peak - cum)
        curve.append(cum)
    assert dd >= 0
    assert dd <= max(curve) - min(curve) + max(0, max(curve) - max(curve))
    # two-pass reference: max over i<=j of curve[i] - curve[j]
    best, run_max = 0, -(10**18)
    for c in curve:
        run_max = max(run_max, c)
        best = max(best, run_max - c)
    assert dd == best
    if all(f >= 0 for f in flows):
        assert dd == 0


@given(
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
    st.lists(st.integers(min_value=0, max_value=50), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_ks_cross_multiplied_d_matches_float_form(a, b):
    """The integer cross-multiplied KS numerator equals the float
    sup|F_a - F_b| definition (scipy-style two-sample D) up to exact
    rational arithmetic."""
    import fractions

    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    d_num = 0
    d_frac = fractions.Fraction(0)
    ca = cb = 0
    for x in values:
        ca += sum(1 for v in a if v == x)
        cb += sum(1 for v in b if v == x)
        d_num = max(d_num, abs(ca * nb - cb * na))
        d_frac = max(
            d_frac,
            abs(
                fractions.Fraction(ca, na) - fractions.Fraction(cb, nb)
            ),
        )
    assert fractions.Fraction(d_num, na * nb) == d_frac


@given(st.integers(min_value=0, max_value=400), st.integers(min_value=1, max_value=64))
@settings(max_examples=300, deadline=None)
def test_chunk_count_formula_covers_all_tokens(n, stride):
    """ceil((n - overlap)/stride) chunks of width stride+overlap
    starting at i*stride cover [0, n) exactly (overlap fixed at
    stride//3 to vary geometry)."""
    import math

    overlap = stride // 3
    width = stride + overlap
    nc = max(1, math.ceil((n - overlap) / stride))
    covered = set()
    for i in range(nc):
        s = i * stride
        covered.update(range(s, min(s + width, n)))
    assert covered == set(range(n))
    # no fully-redundant trailing chunk: the last chunk adds tokens
    # (or the doc fits in one chunk)
    if nc > 1:
        last = (nc - 1) * stride
        assert last < n


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),     # weight (Poisson-ish)
            st.integers(min_value=0, max_value=10_000)  # cents
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_bootstrap_weighted_mean_bounds(pairs):
    """A Poisson-bootstrap resample mean is always within the sample
    min/max (weights only reweight, never extrapolate), and an
    all-ones weighting reproduces the plain mean exactly."""
    w = [p[0] for p in pairs]
    v = [p[1] for p in pairs]
    if sum(w) > 0:
        m = sum(a * b for a, b in zip(w, v)) / sum(w)
        assert min(v) <= m <= max(v)
    m1 = sum(1 * b for b in v) / len(v)
    assert m1 == sum(v) / len(v)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1_000_000),  # us
            st.integers(min_value=1, max_value=10_000),     # cents
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=200, deadline=None)
def test_twap_is_weighted_mean_within_bounds(samples):
    """TWAP lies within [min, max] of the observed values and equals
    the plain mean when gaps are uniform."""
    samples = sorted(samples)
    segs = [
        (c, (samples[i + 1][0] - samples[i][0]))
        for i, (_, c) in enumerate(samples[:-1])
    ]
    segs = [(c, d) for c, d in segs if d > 0]
    if segs:
        tw = sum(c * d for c, d in segs) / sum(d for _, d in segs)
        vals = [c for c, _ in segs]
        assert min(vals) <= tw <= max(vals)
    # uniform gaps -> plain mean of the closed segments
    uniform = [(i * 10, c) for i, (_, c) in enumerate(samples)]
    usegs = [c for (_, c) in uniform[:-1]]
    tw_u = sum(c * 10 for c in usegs) / (10 * len(usegs))
    assert abs(tw_u - sum(usegs) / len(usegs)) < 1e-9


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=0,
        max_size=120,
    )
)
@settings(max_examples=150, deadline=None)
def test_triangle_orientation_counts_each_once(edges):
    """Degree-orientation wedge closure counts every triangle of the
    undirected graph exactly once (reference: brute-force over all
    vertex triples)."""
    und = {tuple(sorted(e)) for e in edges}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    key = lambda x: (deg[x], x)  # noqa: E731
    oriented = {(u, v) if key(u) < key(v) else (v, u) for u, v in und}
    wedge_closed = sum(
        1
        for (a, b) in oriented
        for (b2, c) in oriented
        if b2 == b and (a, c) in oriented
    )
    verts = sorted({x for e in und for x in e})
    brute = sum(
        1
        for i, a in enumerate(verts)
        for b in verts[i + 1:]
        for c in verts[verts.index(b) + 1:]
        if tuple(sorted((a, b))) in und
        and tuple(sorted((b, c))) in und
        and tuple(sorted((a, c))) in und
    )
    assert wedge_closed == brute
