"""MERGE INTO semantics as a DataFrame composition.

Every warehouse engine exposes MERGE (Delta/Iceberg MERGE INTO, ANSI
MERGE): apply a change set to a target table in one pass — update
matched rows, delete matched rows meeting a condition, insert unmatched
source rows. Spark's DataFrame API has no single operator for it; the
idiomatic plan is ONE full-outer join on the key plus row-wise CASE
logic, which is exactly what Delta's MERGE compiles to under the hood.

Scale design:
- One equi-join shuffle on the merge key (both sides), no second pass:
  update/delete/insert are all decided per joined row with codegen'd
  conditionals. At 100 TB the join benefits from AQE skew splitting and,
  when the change batch is small (the common CDC case), from a broadcast
  of the source side — Spark picks that automatically from size stats.
- The output is the NEW target snapshot (copy-on-write semantics, like
  Delta under the hood): callers persist it via sources/io. No
  driver-side collection anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: str,
    update_set: dict[str, Column] | None = None,
    insert_values: dict[str, Column] | None = None,
    delete_condition: Column | None = None,
    action_col: str | None = None,
) -> DataFrame:
    """Return the post-MERGE snapshot of ``target``.

    - matched rows with ``delete_condition`` true are dropped;
    - other matched rows get ``update_set`` columns replaced (Column
      expressions may reference source columns via the ``src`` alias
      and target columns via ``tgt``);
    - unmatched source rows are inserted with ``insert_values``
      (target schema columns absent from the dict become NULL);
    - unmatched target rows pass through unchanged.

    ``action_col`` optionally appends an audit column with the action
    taken ('updated' / 'inserted' / 'kept') — the MERGE metrics column
    warehouse engines report.
    """
    update_set = update_set or {}
    insert_values = insert_values or {}
    t = target.alias("tgt")
    s = source.alias("src")
    joined = t.join(s, F.col(f"tgt.{on}").eqNullSafe(F.col(f"src.{on}")), "full_outer")
    matched = F.col(f"tgt.{on}").isNotNull() & F.col(f"src.{on}").isNotNull()
    src_only = F.col(f"tgt.{on}").isNull()

    if delete_condition is not None:
        joined = joined.filter(~(matched & delete_condition))

    out_cols = []
    for c in target.columns:
        upd = update_set.get(c, F.col(f"tgt.{c}"))
        ins = insert_values.get(
            c,
            F.col(f"src.{on}") if c == on else F.lit(None),
        )
        out_cols.append(
            F.when(src_only, ins)
            .when(matched, upd)
            .otherwise(F.col(f"tgt.{c}"))
            .alias(c)
        )
    if action_col:
        out_cols.append(
            F.when(src_only, F.lit("inserted"))
            .when(matched, F.lit("updated"))
            .otherwise(F.lit("kept"))
            .alias(action_col)
        )
    return joined.select(*out_cols)
