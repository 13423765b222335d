"""COIN-style template URI minting (SURVEY.md T7).

The reference's URIMinter (thirdparty/coin.py:14-54, used by
sources/legal/se/legaluri.py:80-140) picks the highest-priority URI
template whose variable bindings are all present, applies slug
transforms, and composes the URI.  Spark restatement: each template is
a ``F.when(<all bindings bound>, <format expr>)`` column; the minter is
``F.coalesce`` over the templates in priority order — one map-side
pass, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def slug(col):
    """COIN slugTransform: lowercase, non-alphanumerics -> '-'."""
    return F.regexp_replace(F.lower(F.trim(col)), r"[^a-z0-9]+", "-")


def mint_uris(df: DataFrame, templates, uri_col: str = "minted_uri",
              template_col: str = "template") -> DataFrame:
    """templates: ordered [(name, condition_col, uri_expr_col)] —
    highest priority first (COIN orders by priority, then
    type-specificity, then #bindings; the caller encodes that order).
    Adds (minted_uri, template)."""
    uri = F.coalesce(*[F.when(cond, expr) for _, cond, expr in templates])
    name = F.coalesce(*[F.when(cond, F.lit(n)) for n, cond, _ in templates])
    return df.withColumn(uri_col, uri).withColumn(template_col, name)
