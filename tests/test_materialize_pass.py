"""Pins for the r11 registration-seam evaluate-once pass
(registry._materialize_hot_ctes): DuckDB inlines every CTE reference,
so multi-referenced CTEs in unrolled-iteration oracles compound
geometrically (harmonic 2^6, bradley_terry 5^4, ktruss ~5^3, kcore
measured at 1,992 inlined copies of its lineitem-scanning base CTE —
the >74-79 GB sf0.1 temp blowups in ORACLE_SF01_r11.txt). The pass
parses the WITH list with a quote/comment-aware lexer, propagates
inline-copy counts through the CTE DAG (MATERIALIZED = evaluate-once
barrier), and hints every CTE whose copy count reaches the
threshold."""

from __future__ import annotations

import re

from airflow_baseball_spark import registry


def test_copy_counts_simple_chain():
    sql = """
    WITH a AS (SELECT 1 AS x),
    b AS (SELECT x FROM a UNION ALL SELECT x FROM a),
    c AS (SELECT x FROM b UNION ALL SELECT x FROM b)
    SELECT * FROM c UNION ALL SELECT * FROM c
    """
    _, copies = registry._cte_copy_counts(sql)
    # c referenced 2x by final; b 2x per c-copy = 4; a 2x per b-copy = 8
    assert copies == {"c": 2, "b": 4, "a": 8}


def test_materialized_barrier_stops_compounding():
    sql = """
    WITH a AS (SELECT 1 AS x),
    b AS MATERIALIZED (SELECT x FROM a UNION ALL SELECT x FROM a),
    c AS (SELECT x FROM b UNION ALL SELECT x FROM b)
    SELECT * FROM c UNION ALL SELECT * FROM c
    """
    _, copies = registry._cte_copy_counts(sql)
    assert copies["b"] == 4  # logical references
    assert copies["a"] == 2  # but b evaluates ONCE -> a only 2 copies


def test_pass_inserts_hints_and_is_idempotent():
    sql = """
    WITH a AS (SELECT 1 AS x),
    b AS (SELECT x FROM a UNION ALL SELECT x FROM a),
    c AS (SELECT x FROM b UNION ALL SELECT x FROM b)
    SELECT * FROM c UNION ALL SELECT * FROM c
    """
    out = registry._materialize_hot_ctes(sql)
    # a (8 copies) and b (4) cross the threshold; c (2) stays inlined
    assert "a AS MATERIALIZED (" in out
    assert "b AS MATERIALIZED (" in out
    assert "c AS (" in out
    assert registry._materialize_hot_ctes(out) == out


def test_parens_inside_string_literals_do_not_break_parse():
    sql = """
    WITH a AS (SELECT strpos('(((', x) AS p, ')' AS q FROM t),
    b AS (SELECT p FROM a UNION ALL SELECT p FROM a),
    c AS (SELECT p FROM b UNION ALL SELECT p FROM b)
    SELECT * FROM c, c AS c2
    """
    ctes, copies = registry._cte_copy_counts(sql)
    assert [c["name"] for c in ctes] == ["a", "b", "c"]
    assert copies["a"] == 8


def test_column_alias_named_after_cte_is_not_a_reference():
    """ordered_funnel regression: `MIN(us) AS t1` and `t1.t1` column
    refs must not count as table references (and must not flag t1 as
    recursive, which would block its hint)."""
    sql = """
    WITH t1 AS (SELECT user_id, MIN(us) AS t1 FROM ev GROUP BY 1),
    t2 AS (SELECT e.user_id, MIN(t1.t1) AS t1 FROM ev e
           JOIN t1 ON e.user_id = t1.user_id GROUP BY 1),
    u AS (SELECT * FROM t1 UNION ALL SELECT * FROM t1
          UNION ALL SELECT * FROM t1 UNION ALL SELECT * FROM t1)
    SELECT * FROM u, t2
    """
    _, copies = registry._cte_copy_counts(sql)
    assert copies["t1"] == 5  # 4 in u + 1 join in t2 (t1.t1 ignored)
    out = registry._materialize_hot_ctes(sql)
    assert "t1 AS MATERIALIZED (" in out


def test_schema_qualified_reference_is_not_a_cte_reference():
    """The tz-shadow CTEs (`events AS (... FROM main.events)`) must
    not read as self-referencing: main.events resolves to the base
    schema, not the CTE."""
    sql = """
    WITH events AS (SELECT * FROM main.events),
    a AS (SELECT * FROM events UNION ALL SELECT * FROM events),
    b AS (SELECT * FROM a UNION ALL SELECT * FROM a)
    SELECT * FROM b
    """
    out = registry._materialize_hot_ctes(sql)
    assert "events AS MATERIALIZED (" in out


def test_recursive_member_left_unhinted():
    sql = """
    WITH RECURSIVE r AS (
      SELECT 1 AS n UNION ALL SELECT n + 1 FROM r WHERE n < 5
    ),
    u AS (SELECT * FROM r UNION ALL SELECT * FROM r
          UNION ALL SELECT * FROM r UNION ALL SELECT * FROM r)
    SELECT * FROM u
    """
    out = registry._materialize_hot_ctes(sql)
    assert "r AS (" in out and "r AS MATERIALIZED" not in out


def _is_nested_with(sql: str) -> bool:
    spans = list(registry._sql_code_spans(sql))
    code = "".join(sql[a:b] for a, b in spans)
    return len(re.findall(r"(?i)\bWITH\b", code)) > 1


def test_no_shipped_oracle_compounds_past_threshold():
    """The global pin: on every SHIPPED flat-WITH oracle text, no
    non-materialized CTE may reach the threshold's worth of inlined
    copies. This is the permanent gate that keeps a future unrolled
    oracle from reintroducing the blowup class. Nested-WITH oracles
    are excluded -- the flat copy-count model does not apply to
    sub-scoped (often shadowed) CTE lists, the pass skips them by
    design (see test_nested_with_oracles_skipped), and their measured
    compounding is modest (<=12) with sf0.1-proven runtimes."""
    sqls = registry.oracle_sql(raw=True)
    assert len(sqls) == 552
    offenders = []
    for name, sql in sqls.items():
        if _is_nested_with(sql):
            continue
        ctes, copies = registry._cte_copy_counts(sql)
        mat = {c["name"] for c in ctes if c["materialized"]}
        worst = max(
            (v for k, v in copies.items() if k not in mat), default=0
        )
        if worst >= registry._MATERIALIZE_THRESHOLD:
            offenders.append((name, worst))
    assert not offenders, offenders


def test_nested_with_oracles_skipped():
    """Scope guard regression pin: hinting across a nested WITH that
    shadows an outer CTE name trips DuckDB's "Recursive CTE scan
    found without recursive CTE node" INTERNAL error and poisons the
    connection (reproduced at r11 on minhash_calibration, whose
    inlined sigs copy re-declares sh_rows). The pass must leave any
    nested-WITH oracle byte-unchanged."""
    sql = """
    WITH outer_x AS (
      WITH inner_y AS (SELECT 1 AS v)
      SELECT v FROM inner_y
    ),
    u AS (SELECT * FROM outer_x UNION ALL SELECT * FROM outer_x
          UNION ALL SELECT * FROM outer_x UNION ALL SELECT * FROM outer_x)
    SELECT * FROM u
    """
    assert registry._materialize_hot_ctes(sql) == sql
    # and the live instance:
    shipped = registry.oracle_sql(raw=True)["minhash_calibration"]
    assert "MATERIALIZED" not in shipped


def test_probe_oracles_untouched():
    """Diagnostic probes measure the raw driver environment; the
    registration transforms must skip them entirely."""
    sqls = registry.oracle_sql(raw=True)
    for name, sql in sqls.items():
        if name.startswith("probe_"):
            assert "MATERIALIZED" not in sql, name


def test_known_monsters_are_hinted():
    sqls = registry.oracle_sql(raw=True)
    for name in ("kcore", "sssp_bounded", "katz_3step", "pagerank",
                 "personalized_pagerank", "ordered_funnel",
                 "markov_stationary", "burrows_delta"):
        assert sqls[name].count("MATERIALIZED") >= 2, name
