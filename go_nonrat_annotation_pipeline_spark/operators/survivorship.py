"""Golden-record survivorship: merge each entity cluster's records
into one canonical record, attribute by attribute.

The step after entity resolution (operators/… → q_entity_resolution_e2e
builds the clusters; this operator builds the record): classic MDM
survivorship rules, each with a DETERMINISTIC tiebreak so the golden
record is a pure function of the cluster contents:

- ``pick_mode``     most frequent non-null value; ties → smallest value
- ``pick_longest``  longest string; ties → smallest value
- ``pick_latest``   value of the most recent record by an ordering
                    column; ties → largest tiebreak
- plain aggregates (max/min/count) compose alongside.

Every rule is one keyed window (or one aggregate) over the cluster
partition — cluster-sized state, hash-partition shuffles only, and the
same ROW_NUMBER text mirrors in DuckDB (engine mode()/arg_max have
unspecified tiebreaks — never use them cross-engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def pick_mode(df: DataFrame, cluster_col: str, col: str) -> DataFrame:
    """(cluster_col, col): the most frequent non-null value, smallest
    value on ties."""
    counts = (
        df.where(F.col(col).isNotNull())
        .groupBy(cluster_col, col)
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    rn = F.row_number().over(
        Window.partitionBy(cluster_col).orderBy(F.desc("_c"), F.asc(col))
    )
    return (
        counts.withColumn("_rn", rn)
        .where("_rn = 1")
        .select(cluster_col, col)
    )


def pick_longest(df: DataFrame, cluster_col: str, col: str) -> DataFrame:
    """(cluster_col, col): the longest non-null string, smallest value
    on ties."""
    rn = F.row_number().over(
        Window.partitionBy(cluster_col).orderBy(
            F.desc(F.length(col)), F.asc(col)
        )
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(cluster_col, col)
        .withColumn("_rn", rn)
        .where("_rn = 1")
        .select(cluster_col, col)
    )


def pick_latest(
    df: DataFrame, cluster_col: str, col: str, order_col: str
) -> DataFrame:
    """(cluster_col, col): the value carried by the cluster's most
    recent record (max order_col; ties → largest value of col)."""
    rn = F.row_number().over(
        Window.partitionBy(cluster_col).orderBy(
            F.desc(order_col), F.desc(col)
        )
    )
    return (
        df.where(F.col(col).isNotNull())
        .select(cluster_col, col, order_col)
        .withColumn("_rn", rn)
        .where("_rn = 1")
        .select(cluster_col, col)
    )


def sql_pick_mode_cte(
    name: str, source: str, cluster_col: str, col: str
) -> str:
    """DuckDB mirror of :func:`pick_mode` (windows evaluate after the
    GROUP BY, so the count feeds the rank directly)."""
    return f"""
    {name} AS (
      SELECT {cluster_col}, {col} FROM (
        SELECT {cluster_col}, {col},
               ROW_NUMBER() OVER (PARTITION BY {cluster_col}
                                  ORDER BY COUNT(*) DESC, {col} ASC) AS rn
        FROM {source} WHERE {col} IS NOT NULL
        GROUP BY {cluster_col}, {col})
      WHERE rn = 1
    )"""


def sql_pick_cte(
    name: str,
    source: str,
    cluster_col: str,
    col: str,
    order_by: str,
) -> str:
    """DuckDB mirror: one CTE named ``name`` with (cluster_col, col),
    ROW_NUMBER over ``order_by`` within the cluster."""
    return f"""
    {name} AS (
      SELECT {cluster_col}, {col} FROM (
        SELECT {cluster_col}, {col},
               ROW_NUMBER() OVER (PARTITION BY {cluster_col}
                                  ORDER BY {order_by}) AS rn
        FROM {source} WHERE {col} IS NOT NULL)
      WHERE rn = 1
    )"""
