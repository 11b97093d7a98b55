"""Spatial binning: grid-cell rollups keyed by a Morton (Z-order)
cell id — the geo-analytics counterpart of the warehouse layout key
(:func:`~.maintenance.zorder_key` supplies the interleave).

The fixtures carry no coordinates, so the registry query derives a
deterministic synthetic (lat, lon) grid cell per user from the same
universal-hash family the CMS/MinHash constants use (pure 64-bit-safe
integer arithmetic — both engines and the oracle agree exactly). With
real data the derivation is replaced by ``floor((lat + 90) * scale)`` /
``floor((lon + 180) * scale)``; everything downstream is unchanged.

Scale shape: cell derivation is a per-row projection; the rollup is ONE
map-side-combinable aggregate keyed on the cell id (at most |grid|
groups survive), and the Morton key keeps neighboring cells adjacent in
file order when the rollup is persisted — range scans over a spatial
window prune by the key's min/max stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .maintenance import zorder_key, zorder_key_sql

GEO_P = 2_147_483_647
GEO_A1, GEO_B1 = 48_271, 11_213        # lat-cell hash params
GEO_A2, GEO_B2 = 69_621, 44_497        # lon-cell hash params
GEO_LAT_CELLS = 180                    # 1-degree grid
GEO_LON_CELLS = 360
GEO_BITS = 9                           # covers 0..511 >= 359


def _cell_sql(col: str, a: int, b: int, mod: int) -> str:
    return f"(({a} * ({col} % {GEO_P}) + {b}) % {GEO_P}) % {mod}"


def geo_cell_rollup(events: DataFrame, k: int = 50) -> DataFrame:
    """Top-k 1-degree grid cells by event count: derive each user's
    (lat_cell, lon_cell), interleave them into the Morton cell id, and
    aggregate count + 2dp value total per cell. Total order (count
    DESC, cell ASC) → TakeOrderedAndProject."""
    lat = F.expr(_cell_sql("user_id", GEO_A1, GEO_B1, GEO_LAT_CELLS))
    lon = F.expr(_cell_sql("user_id", GEO_A2, GEO_B2, GEO_LON_CELLS))
    cells = events.select(
        lat.alias("lat_cell"),
        lon.alias("lon_cell"),
        "value",
    ).withColumn(
        "cell_id", zorder_key("lat_cell", "lon_cell", bits=GEO_BITS)
    )
    return (
        cells.groupBy("cell_id", "lat_cell", "lon_cell")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy(F.desc("n_events"), F.asc("cell_id"))
        .limit(k)
    )


def geo_cell_rollup_sql(src: str = "events", k: int = 50) -> str:
    lat = _cell_sql("user_id", GEO_A1, GEO_B1, GEO_LAT_CELLS)
    lon = _cell_sql("user_id", GEO_A2, GEO_B2, GEO_LON_CELLS)
    z = zorder_key_sql("lat_cell", "lon_cell", bits=GEO_BITS)
    return f"""
        WITH cells AS (
          SELECT {lat} AS lat_cell, {lon} AS lon_cell, value FROM {src}
        ),
        keyed AS (
          SELECT ({z}) AS cell_id, lat_cell, lon_cell, value FROM cells
        )
        SELECT cell_id, lat_cell, lon_cell,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(SUM(value), 2) AS total_value
        FROM keyed GROUP BY cell_id, lat_cell, lon_cell
        ORDER BY n_events DESC, cell_id ASC LIMIT {k}
    """
