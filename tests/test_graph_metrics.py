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
