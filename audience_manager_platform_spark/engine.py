"""Rule-execution orchestrator (SURVEY.md §3.1/§3.2 collapsed into one
driver process).

The reference's lifecycle crosses three process boundaries per rule
(Flask thread -> spark-submit subprocess -> JVM -> SQLite via JDBC,
``backend/app/core/scheduler.py:90-114``), costing ~10s of JVM cold start
per rule. Here: one long-lived SparkSession; rule creation is driver-side
metadata work; execution is a Spark job materializing parquet.

Plan selection mirrors ``SparkSegmentProcessor._get_segment_data``
(``backend/app/processor/spark_processor.py:63-119``) with two deliberate
fixes:

- the reference *ignores* residual conditions when a rule has
  dependencies (compound path reads only parent outputs) — conditions the
  planner left uncovered are silently dropped. We compute the residual
  base segment and include it in the intersection.
- intersection defaults to user_id-keyed semi-joins (the documented
  intent) instead of full-row set ops (the observed behavior, quirk Q5);
  ``combine_keys=None`` restores reference behavior. The catalog records
  which semantics produced each table.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog, Rule, SegmentMeta
from .operators.segments import combine_segments
from .plans.dependency_finder import find_best_dependency
from .plans.rule_compiler import RuleCompiler
from .sources.transactions import TRANSACTION_COLUMNS  # noqa: F401 (re-export)


class AudienceEngine:
    def __init__(
        self,
        spark: SparkSession,
        catalog: Catalog,
        transactions: Callable[[], DataFrame],
        *,
        compiler: RuleCompiler | None = None,
        combine_keys: Sequence[str] | None = ("user_id",),
    ):
        self.spark = spark
        self.catalog = catalog
        self._transactions = transactions
        self.compiler = compiler or RuleCompiler()
        self.combine_keys = list(combine_keys) if combine_keys else None

    def transactions(self) -> DataFrame:
        """The unified all-transactions view (the analytics routes and
        ad-hoc consumers read it through this accessor)."""
        return self._transactions()

    # ------------------------------------------------------ rule creation
    def create_rule(self, name: str, conditions: list, schedule: str = "ONCE") -> Rule:
        """Entry point A (SURVEY.md §3.1): validate -> dependency rewrite ->
        compile -> persist. No data touched."""
        self.compiler.compile(conditions)  # validate early (strict by default)
        existing = [(r.rule_id, r.conditions) for r in self.catalog.active_rules()]
        rewrite = find_best_dependency(conditions, existing)
        if rewrite:
            rule = self.catalog.add_rule(
                name,
                conditions=list(rewrite.remaining_conditions),
                schedule=schedule,
                depends_on=list(rewrite.depends_on),
                operation=rewrite.operation,
            )
        else:
            rule = self.catalog.add_rule(name, conditions=conditions, schedule=schedule)
        query = self.compiler.compile(rule.conditions)
        self.catalog.upsert_segment(
            SegmentMeta(
                rule_id=rule.rule_id,
                segment_name=f"Segment for rule: {name}",
                table_name=f"segment_output_{rule.rule_id}",
                path=self.catalog.segment_path(rule.rule_id),
                sql_query=(
                    query.to_sql("SELECT * FROM all_transactions", dialect="spark")
                    if rule.conditions or not rule.depends_on
                    else None
                ),
                depends_on=rule.depends_on,
                operation=rule.operation,
                combine_keys=self.combine_keys,
            )
        )
        return rule

    def update_rule(self, rule_id: int, conditions: list) -> Rule:
        """Rule update (reference ``backend/app/api/rules.py:108-225``):
        re-validate, re-run the dependency planner EXCLUDING the rule
        itself (no self-dependency), rewrite catalog metadata. The segment
        is stale until the next execute."""
        self.compiler.compile(conditions)
        existing = [
            (r.rule_id, r.conditions)
            for r in self.catalog.active_rules()
            if r.rule_id != rule_id
        ]
        rewrite = find_best_dependency(conditions, existing, rule_id_to_exclude=rule_id)
        if rewrite:
            rule = self.catalog.update_rule(
                rule_id,
                conditions=list(rewrite.remaining_conditions),
                depends_on=list(rewrite.depends_on),
                operation=rewrite.operation,
            )
        else:
            rule = self.catalog.update_rule(
                rule_id, conditions=conditions, depends_on=[], operation=None
            )
        meta = self.catalog.get_segment(rule_id)
        if meta:
            query = self.compiler.compile(rule.conditions)
            meta.sql_query = (
                query.to_sql("SELECT * FROM all_transactions", dialect="spark")
                if rule.conditions or not rule.depends_on
                else None
            )
            meta.depends_on = rule.depends_on
            meta.operation = rule.operation
            self.catalog.upsert_segment(meta)
        return rule

    def create_compound_rule(
        self, name: str, depends_on: list[int], operation: str, schedule: str = "ONCE"
    ) -> Rule:
        """Explicit compound rule (no conditions of its own), like the
        reference's rule 4."""
        for pid in depends_on:
            self.catalog.get_rule(pid)  # existence check
        rule = self.catalog.add_rule(
            name, conditions=[], schedule=schedule, depends_on=depends_on, operation=operation
        )
        self.catalog.upsert_segment(
            SegmentMeta(
                rule_id=rule.rule_id,
                segment_name=f"Segment for rule: {name}",
                table_name=f"segment_output_{rule.rule_id}",
                path=self.catalog.segment_path(rule.rule_id),
                depends_on=depends_on,
                operation=operation,
                combine_keys=self.combine_keys,
            )
        )
        return rule

    # ------------------------------------------- batch reclassification
    def effective_conditions(self, rule_id: int) -> list:
        """A rule's FULL condition payload with dependency rewrites
        undone: its stored (possibly reduced) conditions plus the
        effective conditions of everything it depends on, recursively.
        Cycle-safe; duplicates collapse by the canonical condition set."""
        from .plans.dependency_finder import conditions_to_set

        out: list = []
        seen_keys: set = set()
        visited: set[int] = set()

        def visit(rid: int) -> None:
            if rid in visited:
                return
            visited.add(rid)
            rule = self.catalog.get_rule(rid)
            for cond in rule.conditions or []:
                # canonical key; unparseable conditions fall back to repr
                key = conditions_to_set([cond]) or repr(cond)
                if key not in seen_keys:
                    seen_keys.add(key)
                    out.append(cond)
            for pid in rule.depends_on or []:
                visit(pid)

        visit(rule_id)
        return out

    def reclassify_catalog(self) -> dict[int, dict]:
        """One-shot batch reclassification of the WHOLE existing catalog —
        the engine-side equivalent of the reference's standalone analysis
        script (``backend/update_segment_query.py:43-89``), for catalogs
        that predate the dependency planner (M3 otherwise only runs at
        create/update time).

        Like the reference: every rule is re-analyzed simplest-first
        (condition count ascending, then rule_id), each against ALL other
        active rules; composites get ``depends_on``/``operation`` and drop
        their direct SQL, base rules get a direct SQL query and cleared
        dependencies. Unlike the reference's dict-merge subset check, the
        analysis is :func:`find_best_dependency` itself — so a catalog
        built without the planner converges to exactly the rewrites
        create-time would have produced had the rules arrived in that
        order (pinned by ``tests/test_engine.py``). Rules already
        rewritten are first expanded back to their effective conditions,
        making the pass idempotent.

        Returns {rule_id: {"operation", "depends_on", "conditions"}} for
        inspection/logging."""
        rules = list(self.catalog.active_rules())
        effective = {r.rule_id: self.effective_conditions(r.rule_id) for r in rules}
        order = sorted(rules, key=lambda r: (len(effective[r.rule_id]), r.rule_id))
        report: dict[int, dict] = {}
        for r in order:
            updated = self.update_rule(r.rule_id, effective[r.rule_id])
            if self.catalog.get_segment(r.rule_id) is None:
                # a pre-planner catalog may hold rules with no segment
                # row at all (raw inserts); create it like create_rule
                # does so the classification lands somewhere visible
                query = self.compiler.compile(updated.conditions)
                self.catalog.upsert_segment(
                    SegmentMeta(
                        rule_id=updated.rule_id,
                        segment_name=f"Segment for rule: {updated.name}",
                        table_name=f"segment_output_{updated.rule_id}",
                        path=self.catalog.segment_path(updated.rule_id),
                        sql_query=(
                            query.to_sql(
                                "SELECT * FROM all_transactions",
                                dialect="spark",
                            )
                            if updated.conditions or not updated.depends_on
                            else None
                        ),
                        depends_on=updated.depends_on,
                        operation=updated.operation,
                        combine_keys=self.combine_keys,
                    )
                )
            report[r.rule_id] = {
                "operation": updated.operation,
                "depends_on": list(updated.depends_on),
                "conditions": list(updated.conditions),
            }
        return report

    # ----------------------------------------------------- plan selection
    def segment_dataframe(self, rule_id: int) -> DataFrame:
        """Entry point B plan selection: compound path folds parent
        outputs (+ residual, see module docstring); base path compiles
        conditions over the unified transaction stream."""
        rule = self.catalog.get_rule(rule_id)
        if rule.depends_on and rule.operation:
            parents = [self.read_segment(pid) for pid in rule.depends_on]
            if rule.conditions:
                parents.append(self._base_segment(rule.conditions))
            return combine_segments(parents, rule.operation, on=self.combine_keys)
        return self._base_segment(rule.conditions)

    def _base_segment(self, conditions: list) -> DataFrame:
        return self.compiler.compile(conditions).dataframe(self._transactions())

    # ------------------------------------------------------ materialize
    def execute_rule(self, rule_id: int, now=None) -> int:
        """Materialize ``segment_output_<rule_id>`` and update the catalog.

        Concurrency: the result is written to a unique temp directory
        and swapped in under an exclusive flock — two concurrent
        ``execute_rule`` calls on the same rule id serialize at the swap
        instead of racing ``mode("overwrite")``'s delete-then-write (the
        reference has the same race on its DROP TABLE + JDBC rewrite
        two-step, S6; a warehouse engine should not). The lock also
        orders the catalog bookkeeping with the swap, so the recorded
        row count always describes the directory a reader sees next. On
        an object store the swap becomes a manifest/metastore pointer
        flip, the lock a metastore transaction.

        An empty result still writes a typed empty table (S8 contract).
        Catalog is updated only after a successful write; returns the
        row count.
        """
        import fcntl
        import os
        import shutil
        import uuid

        df = self.segment_dataframe(rule_id)
        path = self.catalog.segment_path(rule_id)
        tmp = f"{path}.tmp-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(tmp)
        # count from the written files: one extra cheap job, avoids
        # recomputing the whole plan just for the count (A9)
        row_count = self.spark.read.parquet(tmp).count()
        with open(path + ".lock", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                old = f"{path}.old-{uuid.uuid4().hex}"
                if os.path.exists(path):
                    os.rename(path, old)
                    os.rename(tmp, path)
                    shutil.rmtree(old, ignore_errors=True)
                else:
                    os.rename(tmp, path)
                self.catalog.record_refresh(rule_id, row_count)
                self.catalog.mark_run(rule_id, now=now)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)
        return row_count

    def execute_all(self) -> dict[int, int]:
        """Dependency-ordered batch refresh (parents first)."""
        return {rid: self.execute_rule(rid) for rid in self.catalog.topological_order()}

    def read_segment(self, rule_id: int) -> DataFrame:
        """S2: scan a materialized segment (schema travels with parquet)."""
        return self.spark.read.parquet(self.catalog.segment_path(rule_id))

    def sample_segment(self, rule_id: int, n: int = 10):
        """S10: bounded preview for API display."""
        return self.read_segment(rule_id).limit(n).collect()
