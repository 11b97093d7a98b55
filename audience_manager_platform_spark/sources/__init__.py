"""Data sources: parquet table registry, unified transaction view, synthetic
reference-shaped generators, optional JDBC parity reader."""

from .formats import read_table, round_trip, write_table
from .tables import TESTDATA_TABLES, load_table, load_tables, register_views
from .transactions import (
    TRANSACTION_COLUMNS,
    unified_transactions,
    unified_transactions_from_events,
)

__all__ = [
    "TESTDATA_TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "TRANSACTION_COLUMNS",
    "unified_transactions",
    "unified_transactions_from_events",
    "read_table",
    "round_trip",
    "write_table",
]
