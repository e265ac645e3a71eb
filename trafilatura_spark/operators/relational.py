"""Relational operators Spark lacks natively, built as compositions of
DataFrame primitives with 100 TB-safe shapes.

asof_join: the lakehouse staple "latest right row at or before each
left row's timestamp, per key".  The naive formulation is a range join
(key-equi + ts inequality), which Spark executes as a broadcast-nested-
loop or an exploding sort-merge-range at scale.  The scalable shape
used here is UNION + CARRY-FORWARD WINDOW:

  1. tag both sides and union them on (key, ts) — pure map work;
  2. one shuffle: window partitioned by key, ordered by
     (ts, side, right-row tiebreak);
  3. carry the right side's payload forward with last(ignorenulls);
  4. keep only left rows.

Cost: exactly ONE shuffle of |L|+|R| rows, no row multiplication, skew
bounded by the hottest key (AQE-splittable).  DuckDB's native ASOF JOIN
is the correctness twin (queries.py q_events_asof_orders).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """For each left row: the latest right row with right_ts <= left_ts
    and the same ``on`` key, as `asof_<col>` columns (NULL when no such
    row — ASOF LEFT JOIN semantics).

    ``tiebreak_col`` orders right rows sharing a timestamp so the carry
    is deterministic; DuckDB resolves equal-ts matches by scan order, so
    oracle-checked callers should ensure unique (key, ts) on the right."""
    lcols = list(left.columns)
    tb = tiebreak_col or payload_cols[0]

    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tb].dataType).alias("_tb"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    unioned = r.unionByName(l)

    # right rows (_side 0) sort before left rows (_side 1) at equal ts,
    # so a right row stamped exactly at the left ts IS matched (<=)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc(), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_side",
        *[F.col(f"_l_{c}") for c in lcols],
        *[F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}") for c in payload_cols],
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"asof_{c}") for c in payload_cols],
    )
