"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §7.2 step 9: "applyInPandasWithState for custom stateful
operators").

The example operator is a per-user running-spend monitor: state carries
(event_count, total_value) across micro-batches; each batch emits the
updated totals plus a flag when a user crosses a spend threshold — the
streaming generalization of the reference's HAVING-class rules
(``total_spend > X``) that otherwise require a full batch recompute per
refresh.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, event_count long, total_value double, crossed_threshold boolean"
)
STATE_SCHEMA = "event_count long, total_value double"


def running_spend_monitor(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """events must carry (user_id, value). State is O(users) — bounded and
    partitioned by the group key, never driver-side."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count, total = state.get if state.exists else (0, 0.0)
        was_over = total > threshold
        for pdf in pdfs:
            count += len(pdf)
            total += float(pdf["value"].sum())
        state.update((count, round(total, 6)))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "event_count": [count],
                "total_value": [round(total, 2)],
                "crossed_threshold": [(not was_over) and total > threshold],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
