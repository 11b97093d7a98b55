"""MERGE-style upsert without a transactional table format.

The environment (and plain parquet) has no Delta/Iceberg MERGE INTO; the
idiomatic emulation (SCD1) is:

    result = new_rows ∪ (old_rows ⟕anti new_rows on key)

i.e. incoming rows win, untouched old rows survive. This is the engine's
incremental-refresh primitive: instead of recomputing a segment from all
history (the reference's only mode — full DROP + rewrite per refresh,
``backend/app/processor/spark_processor.py:177-203``), fold a delta
aggregate into the existing materialization. One anti-join shuffle on the
key; at warehouse scale both sides can be bucketed on the key to make it
shuffle-free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def upsert(old: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Rows of ``new`` plus rows of ``old`` whose key doesn't appear in
    ``new``. Columns must match by name."""
    keep_old = old.join(new.select(*keys), on=list(keys), how="left_anti")
    return new.unionByName(keep_old)


def scd2_history(
    changes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a change-event stream
    into validity intervals per key.

    Consecutive events with the same ``attr`` value merge into one run
    (run-length semantics, the dual of gaps-and-islands' time-gap
    sessions); each run becomes a row with ``[valid_from, valid_to)`` and
    ``is_current`` for the open tail.

    Both windows share the (key, order) spec, so Catalyst plans ONE
    exchange + sort and evaluates lag and lead in the same window stage —
    a single key-partitioned shuffle regardless of history depth. Order
    carries ``tiebreak`` so simultaneous events resolve identically on
    every engine."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    starts = (
        changes.select(key, ts, tiebreak, attr)
        .withColumn("prev", F.lag(attr).over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col(attr)))
    )
    return (
        starts.select(
            key,
            F.col(attr).alias("state"),
            F.col(ts).alias("valid_from"),
            F.lead(ts).over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_history_sql(
    src: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin of :func:`scd2_history`."""
    return f"""
        WITH ordered AS (
          SELECT {key}, {ts}, {tiebreak}, {attr},
                 LAG({attr}) OVER (
                   PARTITION BY {key} ORDER BY {ts}, {tiebreak}) AS prev
          FROM {src}
        ),
        starts AS (
          SELECT * FROM ordered WHERE prev IS NULL OR prev != {attr}
        )
        SELECT {key}, {attr} AS state, {ts} AS valid_from,
               LEAD({ts}) OVER (
                 PARTITION BY {key} ORDER BY {ts}, {tiebreak}) AS valid_to,
               LEAD({ts}) OVER (
                 PARTITION BY {key} ORDER BY {ts}, {tiebreak}) IS NULL AS is_current
        FROM starts
    """


def cdc_latest_state(
    changes: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Change-data-capture compaction: latest-writer-wins state per key.

    A hash aggregate over ``max(struct(ts, tiebreak, payload))`` — NOT a
    row_number window: partial aggregation collapses each key's history
    map-side, so the shuffle carries one row per key instead of the full
    changelog, and nothing is sorted. This is the materialization step a
    CDC sink runs to fold a day's changelog into a snapshot."""
    from pyspark.sql import functions as F

    return (
        changes.groupBy(key)
        .agg(
            F.max(
                F.struct(
                    F.col(ts).alias("ts"),
                    F.col(tiebreak).alias("tb"),
                    F.col("event_type").alias("state"),
                    F.col("value").alias("value"),
                )
            ).alias("last")
        )
        .select(
            key,
            F.col("last.ts").alias("last_ts"),
            F.col("last.state").alias("last_state"),
            F.round(F.col("last.value"), 2).alias("last_value"),
            F.col("last.tb").alias("last_event_id"),
        )
    )


def cdc_latest_state_sql(
    src: str = "events",
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin of :func:`cdc_latest_state` (window formulation — the
    semantics are identical; the Spark side just evaluates it as an
    aggregate)."""
    return f"""
        SELECT {key}, {ts} AS last_ts, event_type AS last_state,
               ROUND(value, 2) AS last_value, {tiebreak} AS last_event_id
        FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY {key} ORDER BY {ts} DESC, {tiebreak} DESC) AS rn
          FROM {src}
        ) x WHERE rn = 1
    """


def scd2_merge_batch(
    history: DataFrame | None,
    batch: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    attr: str = "event_type",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Incremental SCD2: fold one (micro-)batch of change events into an
    append-only CHANGE-POINT log — the storage layout that makes SCD2
    maintainable at scale.

    Intervals are never stored; only run starts (key, state, valid_from,
    tiebreak) are. ``valid_to``/``is_current`` are derived at read time
    by :func:`scd2_intervals_view` with a lead window, so an append never
    rewrites history (contrast: storing intervals forces an UPDATE of the
    previously-open row on every change — a rewrite of the whole
    partition under plain parquet).

    Per batch: compute the batch's run starts (same lag filter as
    :func:`scd2_history`), then drop a batch-initial start whose state
    equals the key's latest STORED state (the run continues across the
    batch boundary, no new change point). Returns the rows to APPEND.
    Batches must arrive in event-time order between batches (the
    streaming wrapper's availableNow/maxFilesPerTrigger contract);
    within a batch any order is fine.

    Replay safety: foreachBatch + append is at-least-once — a crash
    between the parquet commit and the checkpoint commit replays the
    batch, with the batch's own points already in the log. Two rules
    make the fold idempotent:

    - the boundary check compares the batch-initial start against the
      latest stored point STRICTLY BEFORE the batch's first event (per
      key), not the overall latest — on replay the overall latest has
      advanced to the batch's own last state, which would flip the
      suppression decision and resurrect a suppressed start;
    - the delta is anti-joined against the stored log on the full
      (key, valid_from, tiebreak) identity, so every point the replay
      re-derives drops out.

    Scale: the lag window shuffles only the batch; the boundary check
    and the replay anti-join probe the log keyed on the batch's keys —
    at warehouse scale the log is partitioned by key range, so those
    lookups prune to the touched partitions.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    starts = (
        batch.select(key, ts, tiebreak, attr)
        .withColumn("prev", F.lag(attr).over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col(attr)))
        .select(
            key,
            F.col(attr).alias("state"),
            F.col(ts).alias("valid_from"),
            F.col(tiebreak).alias("tb"),
        )
    )
    if history is None:
        return starts
    # latest stored point BEFORE the batch's first event, per key: the
    # batch's first start always sits at the key's min (ts, tiebreak)
    # (lag is NULL there), so points at/after it are the batch's own
    # appends from a prior partially-committed run of this same fold.
    first = (
        starts.groupBy(key)
        .agg(F.min(F.struct(F.col("valid_from"), F.col("tb"))).alias("first"))
        .select(key, F.col("first.valid_from").alias("fvf"), F.col("first.tb").alias("ftb"))
    )
    latest = (
        history.join(first, key)
        .filter(
            F.struct(F.col("valid_from"), F.col("tb"))
            < F.struct(F.col("fvf"), F.col("ftb"))
        )
        .groupBy(key)
        .agg(F.max(F.struct("valid_from", "tb", "state")).alias("last"))
        .select(key, F.col("last.state").alias("prev_state"))
    )
    w_first = Window.partitionBy(key).orderBy("valid_from", "tb")
    return (
        starts.withColumn("rn", F.row_number().over(w_first))
        .join(latest, key, "left")
        .filter(
            (F.col("rn") != 1)
            | F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("state"))
        )
        .select(key, "state", "valid_from", "tb")
        .join(
            history.select(key, "valid_from", "tb"),
            on=[key, "valid_from", "tb"],
            how="left_anti",
        )
    )


def scd2_intervals_view(history: DataFrame, key: str = "user_id") -> DataFrame:
    """Read-side view over the change-point log: validity intervals via
    one lead window — identical output schema to :func:`scd2_history`."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(key).orderBy("valid_from", "tb")
    return (
        history.select(
            key,
            "state",
            "valid_from",
            F.lead("valid_from").over(w).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


# --------------------------------------------------- MERGE action log
MERGE_CUTOFF = "2024-01-24 00:00:00"


def merge_upsert_actions(
    changes: DataFrame,
    cutoff: str = MERGE_CUTOFF,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> DataFrame:
    """MERGE INTO dry-run: classify what an upsert of the post-``cutoff``
    changelog into the pre-``cutoff`` snapshot WOULD do, row by row —
    the audit table a warehouse MERGE emits (Delta/Iceberg publish these
    as operation metrics; plain parquet has to derive them).

    Snapshot and batch are both latest-writer-wins compactions
    (:func:`cdc_latest_state` shape: one ``max(struct(...))`` aggregate,
    one row per key map-side — NOT a window sort). The classification is
    a single full-outer join on the key:

    - ``insert``   — key only in the batch;
    - ``update``   — key in both, (state, value) changed;
    - ``nochange`` — key in both, payload identical (idempotent replay);
    - keys only in the snapshot are untouched and not emitted (MERGE
      WHEN NOT MATCHED BY SOURCE ... do nothing).

    Both sides aggregate before the join, so the shuffle carries one row
    per key per side regardless of changelog depth — the same geometry
    at 100 TB with the key bucketed."""
    from pyspark.sql import functions as F

    def latest(df: DataFrame) -> DataFrame:
        return (
            df.groupBy(key)
            .agg(
                F.max(
                    F.struct(
                        F.col(ts).alias("ts"),
                        F.col(tiebreak).alias("tb"),
                        F.col("event_type").alias("state"),
                        F.col("value").alias("value"),
                    )
                ).alias("last")
            )
            .select(
                key,
                F.col("last.state").alias("state"),
                F.round(F.col("last.value"), 2).alias("value"),
            )
        )

    snap = latest(changes.filter(F.col(ts) < F.lit(cutoff).cast("timestamp")))
    batch = latest(
        changes.filter(F.col(ts) >= F.lit(cutoff).cast("timestamp"))
    )
    b = batch.select(
        key,
        F.col("state").alias("new_state"),
        F.col("value").alias("new_value"),
    )
    s = snap.select(
        key,
        F.col("state").alias("prev_state"),
        F.col("value").alias("prev_value"),
    )
    return (
        b.join(s, key, "left")
        .select(
            key,
            F.when(F.col("prev_state").isNull(), F.lit("insert"))
            .when(
                (F.col("prev_state") == F.col("new_state"))
                & (F.col("prev_value") == F.col("new_value")),
                F.lit("nochange"),
            )
            .otherwise(F.lit("update"))
            .alias("action"),
            "prev_state",
            "new_state",
            "new_value",
        )
        .orderBy(key)
    )


def merge_upsert_actions_sql(
    src: str = "events",
    cutoff: str = MERGE_CUTOFF,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
) -> str:
    """DuckDB twin of :func:`merge_upsert_actions`."""
    return f"""
        WITH snap AS (
          SELECT {key}, event_type AS prev_state,
                 ROUND(value, 2) AS prev_value
          FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY {key} ORDER BY {ts} DESC, {tiebreak} DESC) rn
            FROM {src} WHERE {ts} < TIMESTAMP '{cutoff}'
          ) x WHERE rn = 1
        ),
        batch AS (
          SELECT {key}, event_type AS new_state,
                 ROUND(value, 2) AS new_value
          FROM (
            SELECT *, ROW_NUMBER() OVER (
              PARTITION BY {key} ORDER BY {ts} DESC, {tiebreak} DESC) rn
            FROM {src} WHERE {ts} >= TIMESTAMP '{cutoff}'
          ) x WHERE rn = 1
        )
        SELECT b.{key},
               CASE WHEN s.prev_state IS NULL THEN 'insert'
                    WHEN s.prev_state = b.new_state
                         AND s.prev_value = b.new_value THEN 'nochange'
                    ELSE 'update' END AS action,
               s.prev_state, b.new_state, b.new_value
        FROM batch b LEFT JOIN snap s ON b.{key} = s.{key}
        ORDER BY b.{key}
    """


# -------------------------------------- algebraic rollup maintenance
ALG_MERGE_CUTOFF = "2001-01-01 00:00:00"


def algebraic_rollup_merge(
    orders: DataFrame, cutoff: str = ALG_MERGE_CUTOFF
) -> DataFrame:
    """Incremental rollup maintenance by ALGEBRAIC MERGE — the third
    strategy next to full recompute (the reference's only mode) and
    partition recompute-from-base (:func:`~.maintenance.
    incremental_rollup_refresh`): count/sum are commutative monoids, so
    the refreshed rollup is ``prev ⊕ agg(delta)`` — one full-outer join
    on the group key, NEVER re-reading the base table. Cost is
    O(|delta| + |groups|) instead of O(|touched base partitions|); this
    is the strategy a 100 TB hourly rollup wants when deltas are
    append-only (it cannot express retractions — that's what the
    partition-recompute variant is for).

    The fixture split simulates the ingest: ``prev`` is the rollup over
    orders before ``cutoff`` (the stored materialization), the delta is
    everything after. The oracle is the plain GROUP BY over the whole
    table — the lossless-maintenance contract: merge(prev, delta) must
    equal recompute(all)."""
    from pyspark.sql import functions as F

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy(
            "o_custkey",
            F.date_format("o_orderdate", "yyyy").alias("year"),
        ).agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("total_price"),
        )

    cut = F.lit(cutoff).cast("timestamp")
    prev = rollup(orders.filter(F.col("o_orderdate") < cut))
    delta = rollup(orders.filter(F.col("o_orderdate") >= cut))
    p = prev.select(
        "o_custkey",
        "year",
        F.col("n_orders").alias("n_p"),
        F.col("total_price").alias("s_p"),
    )
    d = delta.select(
        "o_custkey",
        "year",
        F.col("n_orders").alias("n_d"),
        F.col("total_price").alias("s_d"),
    )
    return (
        p.join(d, ["o_custkey", "year"], "full_outer")
        .select(
            "o_custkey",
            "year",
            (
                F.coalesce(F.col("n_p"), F.lit(0))
                + F.coalesce(F.col("n_d"), F.lit(0))
            ).alias("n_orders"),
            F.round(
                F.coalesce(F.col("s_p"), F.lit(0.0))
                + F.coalesce(F.col("s_d"), F.lit(0.0)),
                2,
            ).alias("total_price"),
        )
        .orderBy("o_custkey", "year")
    )


def algebraic_rollup_merge_sql(src: str = "orders") -> str:
    """DuckDB twin: the MERGED rollup must equal the one-shot GROUP BY
    over the full table — the oracle IS the recompute, so it bypasses
    the merge entirely (checking the contract, not mirroring the
    implementation)."""
    return f"""
        SELECT o_custkey,
               strftime(o_orderdate, '%Y') AS year,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS total_price
        FROM {src}
        GROUP BY 1, 2
        ORDER BY o_custkey, year
    """


# --------------------------------------------- bitemporal restatement
BITEMP_CORRECTION_RESIDUE = 50
BITEMP_CORRECTION_LAG_D = 3
BITEMP_HORIZON_D = 10


def bitemporal_restatements(
    events: DataFrame,
    correction_residue: int = BITEMP_CORRECTION_RESIDUE,
    correction_lag_d: int = BITEMP_CORRECTION_LAG_D,
    horizon_d: int = BITEMP_HORIZON_D,
) -> DataFrame:
    """Bitemporal audit — the question mono-temporal SCD2 cannot ask:
    "for effective time T, does what we believe NOW differ from what we
    believed THEN?" Late corrections (rows whose effective time
    precedes their recorded time) silently rewrite history; finance and
    compliance pipelines must enumerate those restatements, not just
    serve the latest belief.

    The fixture has no correction stream, so one is PLANTED
    deterministically: every ``correction_residue``-th event is a late
    correction whose effective ts lags its recorded ts by
    ``correction_lag_d`` days (real data replaces the synthesis with
    its actual valid-time column; everything downstream unchanged).
    T = max(recorded) - ``horizon_d`` days. belief(asof-effective T,
    known-at K) is the standard argmax over (effective_ts, event_id)
    with recorded_ts <= K; the audit emits users where belief(T, now)
    differs from belief(T, T) — including NULL -> state backfills
    (null-safe compare).

    Shape at scale: T is a 1-row broadcast; the two beliefs are two
    row_number windows over the SAME user-keyed sort (one shuffle);
    the join of two |users|-row belief tables is keyed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    eff = F.expr(
        f"CASE WHEN event_id % {int(correction_residue)} = 0"
        f" THEN ts - INTERVAL {int(correction_lag_d)} DAYS ELSE ts END"
    )
    rows = events.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("recorded_ts"),
        eff.alias("effective_ts"),
    )
    t_row = rows.agg(
        (F.max("recorded_ts") - F.expr(f"INTERVAL {int(horizon_d)} DAYS"))
        .alias("t_eff")
    )
    based = rows.crossJoin(F.broadcast(t_row)).filter(
        F.col("effective_ts") <= F.col("t_eff")
    )

    def belief(df: DataFrame, alias: str) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy(
            F.desc("effective_ts"), F.desc("event_id")
        )
        return (
            df.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("user_id", F.col("state").alias(alias))
        )

    now_b = belief(based, "state_now")
    then_b = belief(
        based.filter(F.col("recorded_ts") <= F.col("t_eff")), "state_then"
    )
    return (
        now_b.join(then_b, "user_id", "full_outer")
        .filter(~F.col("state_now").eqNullSafe(F.col("state_then")))
        .select("user_id", "state_then", "state_now")
        .orderBy("user_id")
    )


def bitemporal_restatements_sql(
    src: str = "events",
    correction_residue: int = BITEMP_CORRECTION_RESIDUE,
    correction_lag_d: int = BITEMP_CORRECTION_LAG_D,
    horizon_d: int = BITEMP_HORIZON_D,
) -> str:
    return f"""
        WITH rows_ AS (
          SELECT user_id, event_id, event_type AS state,
                 ts AS recorded_ts,
                 CASE WHEN event_id % {int(correction_residue)} = 0
                      THEN ts - INTERVAL {int(correction_lag_d)} DAY
                      ELSE ts END AS effective_ts
          FROM {src}
        ),
        t AS (
          SELECT MAX(recorded_ts) - INTERVAL {int(horizon_d)} DAY AS t_eff
          FROM rows_
        ),
        based AS (
          SELECT r.* FROM rows_ r, t WHERE r.effective_ts <= t.t_eff
        ),
        now_b AS (
          SELECT user_id, state AS state_now FROM (
            SELECT user_id, state, ROW_NUMBER() OVER (
              PARTITION BY user_id
              ORDER BY effective_ts DESC, event_id DESC) AS _rk
            FROM based
          ) WHERE _rk = 1
        ),
        then_b AS (
          SELECT user_id, state AS state_then FROM (
            SELECT user_id, state, ROW_NUMBER() OVER (
              PARTITION BY user_id
              ORDER BY effective_ts DESC, event_id DESC) AS _rk
            FROM based, t WHERE recorded_ts <= t.t_eff
          ) WHERE _rk = 1
        )
        SELECT COALESCE(n.user_id, o.user_id) AS user_id,
               o.state_then, n.state_now
        FROM now_b n FULL OUTER JOIN then_b o ON n.user_id = o.user_id
        WHERE n.state_now IS DISTINCT FROM o.state_then
        ORDER BY user_id
    """
