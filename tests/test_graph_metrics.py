"""Invariant tests for the round-5 graph metrics (queries_mining):
the oracle diff proves values; these guard the math invariants and
the scale-relevant plan shapes."""

from __future__ import annotations

from airflow_baseball_spark.queries_mining import (
    _above_avg_edges,
    q_assoc_rules,
    q_clustering_coeff,
    q_degree_assortativity,
    q_node_jaccard,
)

SF = "/root/testdata/sf0.001"


def test_above_avg_edges_is_proper_subset(spark):
    edges = _above_avg_edges(spark, SF).collect()
    # scale-invariant threshold: strictly between empty and complete
    n = len(edges)
    assert 0 < n < 300
    for r in edges:
        assert r.brand_a < r.brand_b  # canonical orientation


def test_node_jaccard_bounds(spark):
    rows = q_node_jaccard(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 1 <= r.common
        assert 0.0 < r.jaccard <= 1.0 + 1e-9


def test_clustering_coeff_bounds_and_cover(spark):
    edges = _above_avg_edges(spark, SF).collect()
    verts = {r.brand_a for r in edges} | {r.brand_b for r in edges}
    rows = q_clustering_coeff(spark, SF).collect()
    # every vertex of the graph reports exactly once (left join keeps
    # triangle-free vertices)
    assert {r.v for r in rows} == verts
    for r in rows:
        assert 0.0 <= r.clustering_coeff <= 1.0 + 1e-9
        # n_tri at a vertex can't exceed its neighbor-pair count
        assert r.n_tri <= r.degree * (r.degree - 1) // 2


def test_assortativity_in_range(spark):
    rows = q_degree_assortativity(spark, SF).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.n_edges > 0
    assert -1.0 - 1e-9 <= r.assortativity <= 1.0 + 1e-9


def test_assoc_rules_symmetry_and_bounds(spark):
    rows = q_assoc_rules(spark, SF).collect()
    assert rows
    by_dir = {(r.antecedent, r.consequent): r for r in rows}
    for (a, c), r in by_dir.items():
        assert 0.0 < r.confidence <= 1.0 + 1e-9
        rev = by_dir[(c, a)]  # both directions present
        # lift is symmetric, support identical, confidence generally not
        assert rev.support == r.support
        assert abs(rev.lift - r.lift) < 1e-9


def test_kcore_monotone_subgraph(spark):
    from airflow_baseball_spark.queries_mining import q_kcore

    rows = q_kcore(spark, SF).collect()
    full = _above_avg_edges(spark, SF).collect()
    deg0: dict[str, int] = {}
    for e in full:
        deg0[e.brand_a] = deg0.get(e.brand_a, 0) + 1
        deg0[e.brand_b] = deg0.get(e.brand_b, 0) + 1
    for r in rows:
        # peeling only removes edges: residual degree <= original
        assert r.degree <= deg0[r.v]
        assert r.degree >= 1


def test_degree_oriented_triangles_hub_graph(spark):
    """Synthetic power-law-ish hub: the orientation must (a) count
    triangles exactly, (b) bound every vertex's oriented out-degree
    by O(sqrt(2E)) — the hub's raw degree must NOT survive as join
    fanout."""
    from itertools import combinations

    from airflow_baseball_spark.operators.graph import (
        enumerate_triangles,
        orient_edges_by_degree,
    )

    hub = "HUB"
    leaves = [f"L{i:02d}" for i in range(40)]
    edges = [(hub, leaf) for leaf in leaves]
    # triangles through the hub: leaf-leaf chords
    edges += [("L00", "L01"), ("L02", "L03"), ("L04", "L05")]
    # one triangle not touching the hub
    edges += [("T0", "T1"), ("T1", "T2"), ("T0", "T2")]
    canon = [tuple(sorted(e)) for e in edges]
    df = spark.createDataFrame(canon, ["brand_a", "brand_b"])

    # brute-force expected triangle count
    adjacency: dict[str, set[str]] = {}
    for a, b in canon:
        adjacency.setdefault(a, set()).add(b)
        adjacency.setdefault(b, set()).add(a)
    verts = sorted(adjacency)
    expected = sum(
        1
        for x, y, z in combinations(verts, 3)
        if y in adjacency[x] and z in adjacency[x] and z in adjacency[y]
    )
    assert expected == 4

    tri = enumerate_triangles(df).collect()
    assert len(tri) == expected
    # each triangle appears exactly once, as 3 distinct vertices
    assert len({tuple(sorted([r.va, r.vb, r.vc])) for r in tri}) == expected

    # fanout bound: oriented out-degree <= sqrt(2E) + 1 everywhere,
    # and the degree-40+ hub must orient almost everything INWARD
    o = orient_edges_by_degree(df).collect()
    out: dict[str, int] = {}
    for r in o:
        out[r.src] = out.get(r.src, 0) + 1
    n_e = len(canon)
    bound = int((2 * n_e) ** 0.5) + 1
    assert max(out.values()) <= bound
    assert out.get(hub, 0) <= 1  # raw degree 43 -> near-zero fanout


def test_materialize_edge_list_builds_once(spark):
    from airflow_baseball_spark.operators.graph import (
        clear_edge_cache,
        materialize_edge_list,
    )

    calls = {"n": 0}

    def build(s, d):
        calls["n"] += 1
        return s.createDataFrame(
            [("A", "B"), ("B", "C")], ["brand_a", "brand_b"]
        )

    clear_edge_cache()
    try:
        a = materialize_edge_list(spark, SF, "t-build-once", build)
        b = materialize_edge_list(spark, SF, "t-build-once", build)
        assert calls["n"] == 1  # second call served from the memo
        assert a is b
        assert a.count() == 2
        # different key -> fresh build
        materialize_edge_list(spark, SF, "t-other-key", build)
        assert calls["n"] == 2
    finally:
        clear_edge_cache()


def test_sssp_bounded_invariants(spark):
    from airflow_baseball_spark.queries_mining import q_sssp_bounded

    rows = q_sssp_bounded(spark, SF).collect()
    assert rows
    costs = {r.node: r.cost for r in rows}
    source = min(costs)  # source is the lexicographically smallest brand
    assert costs[source] == 0
    assert all(c >= 0 for c in costs.values())
    # every non-source cost is at least the cheapest possible edge
    nonzero = [c for n, c in costs.items() if n != source]
    assert nonzero and min(nonzero) > 0


def test_label_propagation_communities(spark):
    from airflow_baseball_spark.queries_mining import q_label_propagation

    rows = q_label_propagation(spark, SF).collect()
    assert rows
    edges = _above_avg_edges(spark, SF).collect()
    verts = {r.brand_a for r in edges} | {r.brand_b for r in edges}
    # every vertex labeled exactly once; labels are vertex ids
    assert {r.v for r in rows} == verts
    labels = {r.lbl for r in rows}
    assert labels <= verts
    # community sizes are consistent
    from collections import Counter

    sizes = Counter(r.lbl for r in rows)
    for r in rows:
        assert r.n_members == sizes[r.lbl]


def test_harmonic_centrality_bounds(spark):
    from airflow_baseball_spark.queries_mining import q_harmonic_centrality

    r = q_harmonic_centrality(spark, SF).collect()[0]
    assert r.n_reached >= 1
    # each reached vertex contributes at most 1.0 (dist >= 1)
    assert 0 < r.harmonic <= r.n_reached + 1e-9
    assert r.harmonic_micro <= r.n_reached * 1000000


def test_harmonic_oracle_materialized_hops_bound_memory():
    """r11 regression pin: the harmonic oracle's hop CTEs must carry
    AS MATERIALIZED. Each d{i} references d{i-1} twice (carry-forward
    + expansion) and DuckDB inlines CTE references, so the un-hinted
    form duplicates the pairs subtree 2^rounds times -- at sf0.1 that
    exhausted >79 GB of temp (OVERFLOW_r10.txt addendum). Beyond the
    text pin, execute the oracle at sf0.1 under a hard 8 GB DuckDB
    memory limit: with evaluate-once hops it finishes in well under a
    second; if the hints are ever dropped the limit aborts the query
    here instead of at a future sweep."""
    from pathlib import Path

    import duckdb
    import pytest

    from airflow_baseball_spark.queries_mining import _harmonic_sql
    from oracle_harness import duckdb_connect

    sql = _harmonic_sql()
    # 6 hops + sym2 + the shared _PAIRS_SQL ob (hinted when the
    # CTE-inlining blowup class was closed repo-wide)
    assert sql.count("AS MATERIALIZED") == 8

    sf = "/root/testdata/sf0.1"
    if not Path(sf).is_dir():
        pytest.skip("testdata sf0.1 not present")
    con = duckdb_connect(sf)
    con.execute("SET memory_limit='8GB'")
    try:
        rows = con.execute(sql).fetchall()
    except duckdb.OutOfMemoryException as exc:  # pragma: no cover
        raise AssertionError(
            "harmonic oracle exceeded 8GB at sf0.1 -- exponential "
            "CTE inlining is back"
        ) from exc
    assert len(rows) == 1 and any(
        isinstance(v, int) and v >= 1 for v in rows[0]
    )


def test_bradley_terry_oracle_materialized_bound_memory():
    """r11 regression pin, same mechanism as the harmonic pin above
    but denser: _bt_sql's t{r} joins the previous round TWICE
    (pi_i / pi_j), p{r} reads r{r} twice (FROM + scalar subquery),
    dirs reads pair twice, matches self-joins ob -- so the un-hinted
    inlined tree doubles per MM round on an already-squared base and
    exhausted >79 GB of DuckDB temp at sf0.1 (ORACLE_SF01_r11.txt).
    Pin the 17 MATERIALIZED hints and execute at sf0.1 under a hard
    8 GB limit (post-fix: ~0.8 s)."""
    from pathlib import Path

    import duckdb
    import pytest

    from airflow_baseball_spark.queries_mining import _bt_sql
    from oracle_harness import duckdb_connect

    sql = _bt_sql()
    assert sql.count("AS MATERIALIZED") == 17

    sf = "/root/testdata/sf0.1"
    if not Path(sf).is_dir():
        pytest.skip("testdata sf0.1 not present")
    con = duckdb_connect(sf)
    con.execute("SET memory_limit='8GB'")
    try:
        rows = con.execute(sql).fetchall()
    except duckdb.OutOfMemoryException as exc:  # pragma: no cover
        raise AssertionError(
            "bradley_terry oracle exceeded 8GB at sf0.1 -- exponential "
            "CTE inlining is back"
        ) from exc
    assert len(rows) >= 1
