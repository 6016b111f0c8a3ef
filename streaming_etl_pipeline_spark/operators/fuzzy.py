"""Fuzzy string matching / entity resolution: deletion-neighborhood
(SymSpell-style) blocking + edit-distance verification.

Metadata dedup needs approximate *string* matching (typo'd names, IDs,
titles) where shingle methods are too coarse. The classic scalable
scheme is the symmetric-delete trick (Garbe's SymSpell, public domain):
for edit distance ≤ 1, two strings must share at least one member of
their deletion neighborhoods ``{x} ∪ {x minus char i}`` —
- substitution at position i: deleting i from both sides yields the
  same string;
- insertion/deletion: deleting the extra char from the longer side
  yields the shorter one, which is in its own neighborhood.
So blocking on neighborhood members has **exact recall at distance 1**
(unlike prefix/soundex blocks, which miss edits inside the block key),
and every candidate is verified with true Levenshtein.

Scale shape: the explode emits len+1 keys per string — corpus × (L+1)
rows, hashed to uniform md5 longs for the self-join; no all-pairs
anywhere. Distance-2 support would block on double deletions (L² keys)
— the same plan, quadratically more block rows; beyond that, use the
shingle-based dedup family (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from streaming_etl_pipeline_spark.functions.core import md5_long, md5_long_sql


def deletion_variants(col: str) -> Column:
    """``{x} ∪ {x with char i deleted}`` — the distance-1 block keys.
    array_distinct collapses repeats from runs of equal chars."""
    return F.array_distinct(
        F.expr(
            f"array_union(array({col}), "
            f"transform(sequence(1, length({col})), "
            f"i -> concat(substring({col}, 1, i - 1), "
            f"substring({col}, i + 1, 1000000))))"
        )
    )


def deletion_variants_sql(col_sql: str) -> str:
    """DuckDB twin of :func:`deletion_variants`."""
    return (
        f"list_distinct(list_append(list_transform(range(1, length({col_sql}) + 1), "
        f"i -> substr({col_sql}, 1, i - 1) || substr({col_sql}, i + 1, 1000000)), "
        f"{col_sql}))"
    )


def edit1_pairs(
    df: DataFrame, id_col: str = "id", name_col: str = "name"
) -> DataFrame:
    """All pairs within Levenshtein distance 1 (exact — the deletion
    blocks guarantee recall; Levenshtein guarantees precision). Output:
    ``(id_a, id_b, name_a, name_b, distance)`` with id_a < id_b.
    """
    v = df.select(
        F.col(id_col), F.col(name_col),
        F.explode(deletion_variants(name_col)).alias("_v"),
    ).select(id_col, name_col, md5_long("_v").alias("_vh"))
    a = v.select(
        F.col(id_col).alias("id_a"), F.col(name_col).alias("name_a"), "_vh"
    )
    b = v.select(
        F.col(id_col).alias("id_b"), F.col(name_col).alias("name_b"), "_vh"
    )
    cand = (
        a.join(b, ["_vh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "name_a", "name_b")
        .distinct()
    )
    return cand.select(
        "id_a", "id_b", "name_a", "name_b",
        F.levenshtein("name_a", "name_b").alias("distance"),
    ).filter(F.col("distance") <= 1)


def edit1_pairs_sql(
    table: str, id_col: str = "id", name_col: str = "name", extra_ctes: str = ""
) -> str:
    """DuckDB oracle twin of :func:`edit1_pairs`. ``extra_ctes`` (e.g.
    ``"names AS (...), "``) lets callers prepend the CTE defining
    ``table``."""
    return f"""
    WITH {extra_ctes}v AS (
      SELECT {id_col} AS id, {name_col} AS name,
             {md5_long_sql("vv")} AS vh
      FROM (SELECT {id_col}, {name_col},
                   unnest({deletion_variants_sql(name_col)}) AS vv
            FROM {table})),
    cand AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
                      a.name AS name_a, b.name AS name_b
      FROM v a JOIN v b ON a.vh = b.vh AND a.id < b.id)
    SELECT id_a, id_b, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS INT) AS distance
    FROM cand
    WHERE levenshtein(name_a, name_b) <= 1
    """
