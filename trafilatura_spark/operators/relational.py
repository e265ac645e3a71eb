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
  3. carry the right side's payload forward as ONE struct with
     last(ignorenulls) — a single coherent right row, never a stitch
     of columns from different right rows even when payload columns
     hold NULLs;
  4. keep only left rows and project the struct's fields.

Cost: exactly ONE shuffle of |L|+|R| rows, no row multiplication.

Skew: the carry-forward window serializes each key in one task — AQE
skew handling splits JOIN partitions, not window partitions, so a hot
key is NOT runtime-splittable here.  That serialization is inherent to
per-key as-of semantics (the running "latest right row" is a sequential
scan per key).  Mitigations that matter at 100 TB: pre-reduce the right
side to unique (key, ts) before the union (as q_events_asof_orders
does — it bounds the window input to distinct timestamps per key), and
pre-aggregate/range-bucket the LEFT side per key when one key carries a
large share of all rows.  DuckDB's native ASOF JOIN is the correctness
twin (queries.py q_events_asof_orders, q_events_asof_nulls).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


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
    oracle-checked callers should ensure unique (key, ts) on the right.

    The payload travels as ONE struct carried by ONE last(ignorenulls):
    every left row's `asof_*` columns come from the same right row, so a
    right row with NULL in one payload column cannot be stitched with an
    older row's value, and a matched-row NULL field stays distinguishable
    from no-match (struct non-null, field null)."""
    lcols = list(left.columns)
    tb = tiebreak_col or payload_cols[0]

    payload_type = T.StructType([right.schema[c] for c in payload_cols])
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tb).alias("_tb"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in lcols],
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(right.schema[tb].dataType).alias("_tb"),
        F.lit(None).cast(payload_type).alias("_p"),
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
        F.last(F.col("_p"), ignorenulls=True).over(w).alias("_pc"),
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col("_pc").getField(c).alias(f"asof_{c}") for c in payload_cols],
    )
