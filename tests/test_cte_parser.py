"""Quote/comment-aware shared-CTE parser in the verify tool
(ADVICE r11, medium): the paren-depth scan must not count parens
inside SQL string literals or ``--`` comments, the body hash must not
collapse whitespace inside literals, and dependency/self-reference
scans must not match names inside literals or comments. A mis-split
that still executes materializes a WRONG temp relation other oracles
silently reuse — the one failure mode the exception fallback cannot
catch.

Pure python (no Spark) — default tranche.
"""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "vdc", os.path.join(os.path.dirname(__file__), "..",
                        "tools", "verify_driver_contract.py"))
vdc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(vdc)


def test_parens_inside_literal_do_not_move_boundaries():
    sql = ("WITH a AS (SELECT regexp_replace(x, '([0-9])', ')(', 'g') "
           "AS y FROM t), b AS (SELECT y FROM a) SELECT * FROM b")
    rec, ctes, tail = vdc._parse_ctes(sql)
    assert [c[0] for c in ctes] == ["a", "b"]
    assert ctes[0][1].endswith("FROM t")
    assert tail.strip() == "SELECT * FROM b"


def test_unbalanced_paren_and_apostrophe_in_comment():
    sql = ("WITH a AS (\n"
           "  -- the Spark side's .agg() (always 1 row\n"
           "  SELECT count(*) AS c FROM t\n"
           "), b AS (SELECT c FROM a) SELECT * FROM b")
    rec, ctes, tail = vdc._parse_ctes(sql)
    assert [c[0] for c in ctes] == ["a", "b"]
    assert tail.strip() == "SELECT * FROM b"


def test_escaped_quote_inside_literal():
    sql = ("WITH a AS (SELECT 'it''s (fine)' AS y FROM t) "
           "SELECT * FROM a")
    rec, ctes, tail = vdc._parse_ctes(sql)
    assert ctes == [("a", "SELECT 'it''s (fine)' AS y FROM t")]


def test_norm_preserves_literal_whitespace():
    # two bodies differing ONLY by whitespace inside a literal are
    # DIFFERENT relations — they must hash apart
    a = vdc._norm("SELECT  replace(x, 'a b', '') FROM t")
    b = vdc._norm("SELECT replace(x, 'a  b', '') FROM t")
    assert a != b
    # ...while whitespace outside literals still collapses
    c = vdc._norm("SELECT   replace(x, 'a b', '')   FROM  t")
    assert a == c


def test_norm_drops_comments():
    a = vdc._norm("SELECT c FROM t -- note one\n")
    b = vdc._norm("SELECT c FROM t -- different note\n")
    assert a == b == "SELECT c FROM t"


def test_dependency_scan_ignores_names_in_literals_and_comments():
    sql = ("WITH shingles AS (SELECT x FROM t), "
           "b AS (SELECT 'shingles' AS lbl, x FROM t), "
           "c AS (SELECT x FROM shingles) SELECT * FROM c")
    rec, info, tail = vdc._analyze_ctes(sql)
    by_name = {name: h for name, _b, h in info}
    # b does not depend on shingles (only a literal mentions it):
    # same body WITHOUT the shingles CTE upstream must hash the same
    sql2 = ("WITH b AS (SELECT 'shingles' AS lbl, x FROM t) "
            "SELECT * FROM b")
    _, info2, _ = vdc._analyze_ctes(sql2)
    assert info2[0][2] == by_name["b"]


def test_self_reference_in_literal_is_not_recursive():
    assert not vdc._self_referencing(
        "a", "SELECT 'a' AS lbl FROM t -- a note about a\n")
    assert vdc._self_referencing("a", "SELECT x FROM a")


def test_registry_sharing_is_preserved():
    """The quote-aware parser must not LOSE sharing on the real
    registry: every oracle the old positional parser analyzed still
    analyzes, and the dedup family still shares chains."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from datafusion_functions_financial_spark.plans import registry
    oracles = registry.all_oracles()
    chains, counts = vdc.plan_shared_ctes(oracles)
    assert len(chains) >= 420
    assert sum(1 for v in counts.values() if v >= 2) >= 100
