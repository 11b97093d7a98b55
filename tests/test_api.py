"""REST facade smoke over the Flask test client: the reference's route
surface (rule CRUD, trigger, sample, lineage) dispatching into the
Spark-backed engine."""

import pytest

flask = pytest.importorskip("flask")

from audience_manager_platform_spark.api import create_app
from audience_manager_platform_spark.catalog import Catalog
from audience_manager_platform_spark.engine import AudienceEngine
from audience_manager_platform_spark.sources import (
    load_table,
    unified_transactions_from_events,
)

AMT = {"field": "transaction_amount", "operator": ">", "value": "120"}
TIER = {"field": "city_tier", "operator": "=", "value": "1"}


@pytest.fixture()
def client(spark, sf_dir, tmp_path):
    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    engine = AudienceEngine(spark, Catalog(str(tmp_path / "cat")), lambda: txns)
    app = create_app(engine)
    app.config["TESTING"] = True
    return app.test_client()


def test_rule_crud_roundtrip(client):
    # create
    r = client.post("/api/rules", json={"rule_name": "spenders", "conditions": [AMT]})
    assert r.status_code == 201 and r.json["status"] == "success"
    rule_id = r.json["data"]["id"]
    # duplicate name -> 409 (reference rules.py:22)
    dup = client.post("/api/rules", json={"rule_name": "spenders", "conditions": [AMT]})
    assert dup.status_code == 409
    # missing fields -> 400
    assert client.post("/api/rules", json={}).status_code == 400
    # list + get
    assert any(x["id"] == rule_id for x in client.get("/api/rules").json["data"])
    got = client.get(f"/api/rules/{rule_id}")
    assert got.json["data"]["conditions"] == [AMT]
    # update
    upd = client.put(f"/api/rules/{rule_id}", json={"conditions": [AMT, TIER]})
    assert upd.status_code == 200
    # trigger -> row_count recorded
    trig = client.post(f"/api/rules/{rule_id}/trigger")
    assert trig.status_code == 200 and trig.json["data"]["row_count"] >= 0
    # sample data flows back as JSON rows
    sample = client.get(f"/api/segments/{rule_id}/sample_data")
    assert sample.json["status"] == "success"
    assert isinstance(sample.json["data"]["sample_data"], list)
    # delete = deactivate
    assert client.delete(f"/api/rules/{rule_id}").status_code == 200
    assert not any(
        x["id"] == rule_id for x in client.get("/api/rules").json["data"]
    )


def test_lineage_endpoint_shape(client):
    r1 = client.post("/api/rules", json={"rule_name": "a", "conditions": [AMT]})
    r2 = client.post(
        "/api/rules", json={"rule_name": "b", "conditions": [AMT, TIER]}
    )
    rid2 = r2.json["data"]["id"]
    g = client.get(f"/api/segments/{rid2}/lineage").json["data"]
    assert {n["id"] for n in g["nodes"]} >= {str(rid2)}
    assert all(
        set(n) == {"id", "data", "position"} for n in g["nodes"]
    )
    assert client.get("/api/rules/99999").status_code == 404
