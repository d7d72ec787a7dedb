"""check_validate_geometries: the exact-integer ring checker
(operators/geomvalid) vs an independent brute-force Python segment
intersector, plus the reference error/closure semantics."""
import duckdb
import pytest

from rsgislib_spark.operators.geomvalid import ring_check_sql


def _orient(ax, ay, bx, by, px, py):
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


def _on_seg(ax, ay, bx, by, px, py):
    return (min(ax, bx) <= px <= max(ax, bx)
            and min(ay, by) <= py <= max(ay, by))


def _seg_intersect(p1, p2, q1, q2):
    o1 = _orient(*p1, *p2, *q1)
    o2 = _orient(*p1, *p2, *q2)
    o3 = _orient(*q1, *q2, *p1)
    o4 = _orient(*q1, *q2, *p2)
    if o1 * o2 < 0 and o3 * o4 < 0:
        return True
    return ((o1 == 0 and _on_seg(*p1, *p2, *q1))
            or (o2 == 0 and _on_seg(*p1, *p2, *q2))
            or (o3 == 0 and _on_seg(*q1, *q2, *p1))
            or (o4 == 0 and _on_seg(*q1, *q2, *p2)))


def _ring_simple(pts):
    m = len(pts)
    edges = [(pts[i], pts[(i + 1) % m]) for i in range(m)]
    for i in range(m):
        for j in range(i + 1, m):
            if j == i + 1 or (i == 0 and j == m - 1):
                continue
            if _seg_intersect(*edges[i], *edges[j]):
                return False
    return True


def _synth_ring(fid):
    m = 3 + fid % 4
    return [((fid * 31 + i * i * 7) % 1000, (fid * 17 + i * 13) % 1000)
            for i in range(m)]


@pytest.fixture(scope="module")
def result():
    con = duckdb.connect()
    con.sql("CREATE VIEW customer AS SELECT "
            "unnest(generate_series(1, 600)) AS c_custkey")
    df = con.sql(ring_check_sql("duckdb")).df()
    return {int(r.fid): r for r in df.itertuples()}


def test_reference_error_and_closure_semantics(result):
    """< 4 stored ring points -> error (dropped from output, here
    valid=0, NULL derived cols); survivors gain the unconditionally
    re-appended closing point (n_out = n_in + 1,
    RSGISVectorUtils.cpp:208 pointer-compare always true)."""
    assert len(result) == 600
    for fid, r in result.items():
        m = 3 + fid % 4
        n_in = m + (1 if fid % 5 == 0 else 0)
        assert r.n_pts_in == n_in
        assert r.valid == (1 if n_in >= 4 else 0)
        if r.valid:
            assert r.n_pts_out == n_in + 1
        else:
            assert r.n_pts_out != r.n_pts_out or r.n_pts_out is None


def test_is_simple_matches_bruteforce(result):
    n_checked = n_nonsimple = 0
    for fid, r in result.items():
        if not r.valid:
            continue
        expect = _ring_simple(_synth_ring(fid))
        assert bool(r.is_simple) == expect, fid
        n_checked += 1
        n_nonsimple += (not expect)
    # the synthetic corpus must exercise BOTH branches
    assert n_checked > 400 and 10 < n_nonsimple < n_checked


def test_known_fixtures():
    """A square is simple; a bowtie (crossing diagonals order) is not."""
    assert _ring_simple([(0, 0), (10, 0), (10, 10), (0, 10)])
    assert not _ring_simple([(0, 0), (10, 10), (10, 0), (0, 10)])
    con = duckdb.connect()
    # fid=25: pre-closed 4-distinct-vertex ring goes through the full
    # pair join; parity of the SQL predicate vs python on that ring
    con.sql("CREATE VIEW customer AS SELECT 25 AS c_custkey")
    r = con.sql(ring_check_sql("duckdb")).df().iloc[0]
    assert bool(r.is_simple) == _ring_simple(_synth_ring(25))
