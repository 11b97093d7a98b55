"""Thin HTTP facade over :class:`AudienceEngine` — the reference is
driven over a Flask REST API (``backend/app/api/rules.py:11-262``,
``backend/app/api/segments.py:8-174``, ``backend/app/api/analytics.py:
6-118``); this module exposes the same route surface and response
envelope (``{"status": "success"|"error", ...}``) over the Spark-backed
engine, so a client of the reference can point at this service
unchanged.

Deliberately thin: every route is a dispatch into engine/catalog methods
that are themselves fully unit-tested — no business logic lives here.
Flask is an optional dependency (import-gated); the engine library works
without it.
"""

from __future__ import annotations

from typing import Any

from .engine import AudienceEngine
from .scheduler import Scheduler


def create_app(engine: AudienceEngine):
    """Build the Flask app. Raises ImportError when flask is absent."""
    from flask import Flask, jsonify, request

    app = Flask("audience_manager_platform_spark")
    scheduler = Scheduler(engine)

    def ok(payload: dict[str, Any], code: int = 200):
        return jsonify({"status": "success", **payload}), code

    def err(message: str, code: int):
        return jsonify({"status": "error", "message": message}), code

    def rule_json(rule) -> dict[str, Any]:
        seg = engine.catalog.get_segment(rule.rule_id)
        return {
            "id": rule.rule_id,
            "rule_name": rule.name,
            "conditions": rule.conditions,
            "schedule": rule.schedule,
            "depends_on": rule.depends_on,
            "operation": rule.operation,
            "is_active": rule.is_active,
            "last_run_at": rule.last_run_at,
            "next_run_at": rule.next_run_at,
            "row_count": seg.row_count if seg else None,
        }

    # ----------------------------------------------------------- rules
    @app.post("/api/rules")
    def create_rule():
        data = request.get_json(silent=True) or {}
        if "rule_name" not in data or "conditions" not in data:
            return err("Missing required fields: rule_name, conditions", 400)
        try:
            rule = engine.create_rule(
                data["rule_name"],
                data["conditions"],
                schedule=data.get("schedule", "ONCE"),
            )
        except ValueError as ex:
            code = 409 if "already exists" in str(ex) else 400
            return err(str(ex), code)
        return ok({"data": rule_json(rule)}, 201)

    @app.get("/api/rules")
    def list_rules():
        return ok({"data": [rule_json(r) for r in engine.catalog.active_rules()]})

    @app.get("/api/rules/<int:rule_id>")
    def get_rule(rule_id: int):
        try:
            return ok({"data": rule_json(engine.catalog.get_rule(rule_id))})
        except KeyError:
            return err(f"rule {rule_id} not found", 404)

    @app.put("/api/rules/<int:rule_id>")
    def put_rule(rule_id: int):
        data = request.get_json(silent=True) or {}
        if "conditions" not in data:
            return err("Missing required field: conditions", 400)
        try:
            rule = engine.update_rule(rule_id, data["conditions"])
        except KeyError:
            return err(f"rule {rule_id} not found", 404)
        except ValueError as ex:
            return err(str(ex), 400)
        return ok({"data": rule_json(rule)})

    @app.delete("/api/rules/<int:rule_id>")
    def delete_rule(rule_id: int):
        try:
            engine.catalog.deactivate_rule(rule_id)
        except KeyError:
            return err(f"rule {rule_id} not found", 404)
        return ok({"data": {"id": rule_id, "is_active": False}})

    @app.post("/api/rules/<int:rule_id>/trigger")
    def trigger_rule(rule_id: int):
        try:
            row_count = engine.execute_rule(rule_id)
        except KeyError:
            return err(f"rule {rule_id} not found", 404)
        return ok({"data": {"id": rule_id, "row_count": row_count}})

    @app.post("/api/rules/run_due")
    def run_due():
        return ok({"data": {"ran": scheduler.run_due()}})

    # -------------------------------------------------------- segments
    @app.get("/api/segments")
    def list_segments():
        segs = []
        for rule in engine.catalog.active_rules():
            seg = engine.catalog.get_segment(rule.rule_id)
            if seg:
                segs.append(
                    {
                        "rule_id": seg.rule_id,
                        "segment_name": seg.segment_name,
                        "table_name": seg.table_name,
                        "row_count": seg.row_count,
                        "last_refreshed_at": seg.last_refreshed_at,
                    }
                )
        return ok({"data": segs})

    @app.get("/api/segments/<int:rule_id>/sample_data")
    def sample_data(rule_id: int):
        from pyspark.errors import AnalysisException

        # only a genuinely MISSING segment maps to the reference's
        # empty-sample response (unknown rule → KeyError, unmaterialized
        # rule → parquet path not found); real engine/Spark failures must
        # surface as errors, not masquerade as a healthy empty segment
        try:
            rows = engine.sample_segment(rule_id, n=10)
        except (KeyError, FileNotFoundError) as ex:
            return ok({"data": {"sample_data": [], "note": str(ex)}})
        except AnalysisException as ex:
            # pin the error CLASS (stable across Spark versions), with the
            # message substring only as a fallback for classless errors
            cls = ex.getErrorClass() or ""
            if cls == "PATH_NOT_FOUND" or (not cls and "PATH_NOT_FOUND" in str(ex)):
                return ok({"data": {"sample_data": [], "note": str(ex)}})
            return err(str(ex), 500)
        return ok({"data": {"sample_data": [r.asDict() for r in rows]}})

    @app.post("/api/segments/<int:rule_id>/refresh")
    def refresh_segment(rule_id: int):
        try:
            row_count = engine.execute_rule(rule_id)
        except KeyError:
            return err(f"rule {rule_id} not found", 404)
        return ok({"data": {"rule_id": rule_id, "row_count": row_count}})

    @app.get("/api/segments/<int:rule_id>/lineage")
    def lineage(rule_id: int):
        try:
            return ok({"data": engine.catalog.lineage_graph(rule_id)})
        except KeyError:
            return err(f"rule {rule_id} not found", 404)

    return app
