"""Text curation #11: per-source character-class profile — "is this
source prose, tables, code, or garbage?" — the cheapest composition
signal a curation pipeline reads before any tokenizer: letter /
digit / whitespace / other shares per source plus the dominant
class. Complements the gated per-doc quality scores (lexical stats,
boilerplate, composite quality) with a SOURCE-level fingerprint the
mixing policy consumes directly.

Counts come from global regexp_replace length deltas (Spark's
regexp_replace is global by default; DuckDB's takes the 'g' flag) —
exact integers per document, exact BIGINT sums per source, one
double division per share.

Plan shape at 100 TB: one map-side-combinable hash aggregate to the
source relation; no joins, no windows, no UDFs.

Reference anchor: beyond-reference pipeline operator per SURVEY.md
extension scope (text/curation tier).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.series import round_portable, round_portable_duck
from ..sources.tables import load

__all__ = ["charclass_profile"]

_CLASSES = (
    ("letters", "[A-Za-z]"),
    ("digits", "[0-9]"),
    ("spaces", "[ \\t\\n\\r]"),
)


def charclass_profile(df: DataFrame, text_col: str = "text",
                      group_col: str = "source") -> DataFrame:
    """(source, n_chars, letter_share, digit_share, space_share,
    other_share, dominant): the per-source character-class
    fingerprint (dominant = arg-max share with the fixed
    letters/digits/spaces/other precedence on ties)."""
    cnts = [F.sum(F.expr(
        f"length({text_col}) - length(regexp_replace({text_col}, "
        f"'{pat}', ''))")).cast("bigint").alias(f"__{name}")
        for name, pat in _CLASSES]
    agg = (
        df.groupBy(F.col(group_col).alias("source"))
        .agg(F.sum(F.expr(f"length({text_col})")).cast("bigint")
             .alias("n_chars"), *cnts)
        .withColumn("__other", F.expr(
            "n_chars - __letters - __digits - __spaces"))
    )
    share = "(CAST(__{x} AS DOUBLE) / CAST(n_chars AS DOUBLE))"
    dom = (
        "CASE greatest(__letters, __digits, __spaces, __other) "
        "WHEN __letters THEN 'letters' WHEN __digits THEN 'digits' "
        "WHEN __spaces THEN 'spaces' ELSE 'other' END")
    return agg.select(
        "source", "n_chars",
        round_portable(F.expr(share.format(x="letters")), 6)
        .alias("letter_share"),
        round_portable(F.expr(share.format(x="digits")), 6)
        .alias("digit_share"),
        round_portable(F.expr(share.format(x="spaces")), 6)
        .alias("space_share"),
        round_portable(F.expr(share.format(x="other")), 6)
        .alias("other_share"),
        F.expr(dom).alias("dominant"),
    )


# --------------------------------------------------------------------------
# Gate query + mirrored oracle
# --------------------------------------------------------------------------


def _q_charclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return charclass_profile(load(spark, sf_dir, "documents"))


_D_SHARE = "(CAST({x} AS DOUBLE) / CAST(n_chars AS DOUBLE))"
_D_DOM = (
    "CASE greatest(letters, digits, spaces, other) "
    "WHEN letters THEN 'letters' WHEN digits THEN 'digits' "
    "WHEN spaces THEN 'spaces' ELSE 'other' END")

_ORACLE_CHARCLASS = f"""
WITH agg AS (
  SELECT source,
    CAST(sum(length(text)) AS BIGINT) AS n_chars,
    CAST(sum(length(text) - length(regexp_replace(text,
      '[A-Za-z]', '', 'g'))) AS BIGINT) AS letters,
    CAST(sum(length(text) - length(regexp_replace(text,
      '[0-9]', '', 'g'))) AS BIGINT) AS digits,
    CAST(sum(length(text) - length(regexp_replace(text,
      '[ \\t\\n\\r]', '', 'g'))) AS BIGINT) AS spaces
  FROM documents GROUP BY 1
), complete AS (
  SELECT *, n_chars - letters - digits - spaces AS other FROM agg
)
SELECT source, n_chars,
  {round_portable_duck(_D_SHARE.format(x='letters'), 6)}
    AS letter_share,
  {round_portable_duck(_D_SHARE.format(x='digits'), 6)}
    AS digit_share,
  {round_portable_duck(_D_SHARE.format(x='spaces'), 6)}
    AS space_share,
  {round_portable_duck(_D_SHARE.format(x='other'), 6)}
    AS other_share,
  {_D_DOM} AS dominant
FROM complete
"""


QUERIES: dict = {
    "text_charclass_documents": (_q_charclass, _ORACLE_CHARCLASS),
}
