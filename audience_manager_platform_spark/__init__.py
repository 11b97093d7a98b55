"""PySpark-native analytics engine with the capabilities of the
``360-data-engineer/audience-manager-platform`` reference.

The reference (see ``SURVEY.md``) is an audience-segmentation platform:
declarative JSON rules compiled to SQL and executed over two payment
transaction tables, materialized as per-rule segment tables, composed with
a set-operation algebra, complemented by an analytics aggregation suite.

This package re-expresses the whole capability surface Spark-first:

- :mod:`.session` -- one long-lived tuned ``SparkSession``.
- :mod:`.sources` -- parquet-backed table registry with explicit schemas,
  the unified-transaction view, synthetic reference-shaped data.
- :mod:`.plans` -- the rule DSL: condition AST, validation, compilation to
  DataFrame plans (and Spark-SQL rendering), and the dependency planner
  (materialized-view reuse via greedy subset cover).
- :mod:`.operators` -- segment set-algebra, analytics aggregations, joins,
  windows, dedup, similarity search, text analysis, multimodal plumbing.
- :mod:`.functions` -- shared column-expression helpers (all JVM-side).
- :mod:`.streaming` -- Structured Streaming equivalents of the reference's
  scheduled refresh loop.
- :mod:`.catalog` / :mod:`.engine` -- segment catalog + lineage metadata
  and the rule-execution orchestrator.
"""

__version__ = "0.1.0"
