"""Warehouse reconciliation: snapshot diffing and deletion propagation.

``table_diff`` is the anti-entropy check two pipelines run against each
other (yesterday's rollup vs today's rebuild, replica vs primary):
classify every key as added / removed / changed in ONE full-outer join
keyed on the primary key — at 100 TB this is a single co-partitioned
shuffle, and unchanged rows (the overwhelming majority) are dropped
map-side after the join, so only the delta survives to the output.

``forget_users`` is the right-to-be-forgotten sweep: one broadcast
anti-join per fact table against the (tiny) forget list, returning the
audit summary a compliance job must persist. At scale the same plan
runs per partition with the forget list broadcast once — no shuffle of
the fact table at all.

The reference mutates state only by full DROP + rewrite per segment
(``backend/app/processor/spark_processor.py:177-203``) and has no diff
or deletion tooling; both are required operational surface for a
deployed warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare: list[str],
) -> DataFrame:
    """(keys..., change) rows for every key that differs between the two
    snapshots: 'added' (new only), 'removed' (old only), 'changed' (both
    present, any compare column differing — null-safe). Identical rows
    are filtered out; the output is the reconciliation delta."""
    # presence markers, not key null-checks: a legitimately-NULL key
    # would otherwise read as "absent" and flip added/removed; the key
    # equality itself is null-safe so NULL keys pair up across snapshots
    o = old.select(
        F.lit(1).alias("_op"),
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_oc_{c}") for c in compare],
    )
    n = new.select(
        F.lit(1).alias("_np"),
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_nc_{c}") for c in compare],
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}").eqNullSafe(F.col(f"_nk_{k}"))
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    in_old = F.col("_op").isNotNull()
    in_new = F.col("_np").isNotNull()
    same = None
    for c in compare:
        eq = F.col(f"_oc_{c}").eqNullSafe(F.col(f"_nc_{c}"))
        same = eq if same is None else same & eq
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    return (
        joined.select(
            *[
                F.coalesce(F.col(f"_nk_{k}"), F.col(f"_ok_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change"),
        )
        .filter(F.col("change").isNotNull())
    )


def table_diff_sql(old_sql: str, new_sql: str, keys: list[str],
                   compare: list[str]) -> str:
    # same NULL discipline as the Spark side: presence markers + null-safe
    # key equality, so NULL keys pair up instead of flipping added/removed
    on = " AND ".join(f"o.{k} IS NOT DISTINCT FROM n.{k}" for k in keys)
    same = " AND ".join(f"o.{c} IS NOT DISTINCT FROM n.{c}" for c in compare)
    key_cols = ", ".join(f"COALESCE(n.{k}, o.{k}) AS {k}" for k in keys)
    return f"""
        SELECT * FROM (
          SELECT {key_cols},
                 CASE WHEN o._op IS NULL THEN 'added'
                      WHEN n._np IS NULL THEN 'removed'
                      WHEN NOT ({same}) THEN 'changed'
                 END AS change
          FROM (SELECT 1 AS _op, * FROM ({old_sql}) oi) o
          FULL OUTER JOIN (SELECT 1 AS _np, * FROM ({new_sql}) ni) n ON {on}
        ) d WHERE change IS NOT NULL
    """


def forget_users(events: DataFrame, user_ids: list[int]) -> DataFrame:
    """Deletion-propagation audit: per event_type, how many rows the
    purge removes and how many survive. The purge itself is the same
    anti-join with the summary aggregate replaced by the table write."""
    forget = F.col("user_id").isin(user_ids)
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(F.when(forget, 1).otherwise(0)).alias("purged_rows"),
            F.sum(F.when(~forget | F.col("user_id").isNull(), 1).otherwise(0)).alias(
                "surviving_rows"
            ),
        )
    )


def forget_users_sql(user_ids: list[int], src: str = "events") -> str:
    ids = ", ".join(str(i) for i in user_ids)
    return f"""
        SELECT event_type,
               CAST(SUM(CASE WHEN user_id IN ({ids}) THEN 1 ELSE 0 END)
                 AS BIGINT) AS purged_rows,
               CAST(SUM(CASE WHEN user_id NOT IN ({ids}) OR user_id IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS surviving_rows
        FROM {src}
        GROUP BY event_type
    """
