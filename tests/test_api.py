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
from audience_manager_platform_spark.sources.transactions import (
    transactions_with_id,
)

AMT = {"field": "transaction_amount", "operator": ">", "value": "120"}
TIER = {"field": "city_tier", "operator": "=", "value": "1"}


@pytest.fixture()
def client(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    txns = unified_transactions_from_events(events)
    engine = AudienceEngine(spark, Catalog(str(tmp_path / "cat")), lambda: txns)
    app = create_app(engine, transactions_detail=lambda: transactions_with_id(events))
    app.config["TESTING"] = True
    return app.test_client()


def test_rule_crud_roundtrip(client):
    # create
    r = client.post("/api/v1/rules", json={"rule_name": "spenders", "conditions": [AMT]})
    assert r.status_code == 201 and r.json["status"] == "success"
    rule_id = r.json["data"]["id"]
    # duplicate name -> 409 (reference rules.py:22)
    dup = client.post("/api/v1/rules", json={"rule_name": "spenders", "conditions": [AMT]})
    assert dup.status_code == 409
    # missing fields -> 400
    assert client.post("/api/v1/rules", json={}).status_code == 400
    # list + get
    assert any(x["id"] == rule_id for x in client.get("/api/v1/rules").json["data"])
    got = client.get(f"/api/v1/rules/{rule_id}")
    assert got.json["data"]["conditions"] == [AMT]
    # update
    upd = client.put(f"/api/v1/rules/{rule_id}", json={"conditions": [AMT, TIER]})
    assert upd.status_code == 200
    # trigger -> row_count recorded
    trig = client.post(f"/api/v1/rules/{rule_id}/trigger")
    assert trig.status_code == 200 and trig.json["data"]["row_count"] >= 0
    # sample data flows back as JSON rows
    sample = client.get(f"/api/v1/segments/{rule_id}/sample_data")
    assert sample.json["status"] == "success"
    assert isinstance(sample.json["data"]["sample_data"], list)
    # delete = deactivate
    assert client.delete(f"/api/v1/rules/{rule_id}").status_code == 200
    assert not any(
        x["id"] == rule_id for x in client.get("/api/v1/rules").json["data"]
    )


def test_lineage_endpoint_shape(client):
    r1 = client.post("/api/v1/rules", json={"rule_name": "a", "conditions": [AMT]})
    r2 = client.post(
        "/api/v1/rules", json={"rule_name": "b", "conditions": [AMT, TIER]}
    )
    rid2 = r2.json["data"]["id"]
    g = client.get(f"/api/v1/segments/{rid2}/lineage").json["data"]
    assert {n["id"] for n in g["nodes"]} >= {str(rid2)}
    assert all(
        set(n) == {"id", "data", "position"} for n in g["nodes"]
    )
    assert client.get("/api/v1/rules/99999").status_code == 404


# ------------------------------------------------------------ analytics
# reference backend/app/api/analytics.py:6-118 — envelope + semantics


def test_health(client):
    r = client.get("/api/v1/health")
    assert r.status_code == 200 and r.json == {"status": "healthy"}


def test_analytics_summary_envelope(client):
    r = client.get("/api/v1/analytics/summary")
    assert r.status_code == 200 and r.json["status"] == "success"
    data = r.json["data"]
    assert set(data) == {
        "total_transactions", "total_amount", "avg_amount", "unique_users",
    }
    assert data["total_transactions"] > 0
    assert data["unique_users"] > 0


def test_analytics_category_totals_filters_echoed(client):
    r = client.get("/api/v1/analytics/category-totals?start_date=2024-01-01")
    assert r.status_code == 200
    assert r.json["filters"] == {"start_date": "2024-01-01", "end_date": None}
    rows = r.json["data"]
    assert rows and all(
        set(x) == {"category", "transaction_count", "total_amount"} for x in rows
    )
    # categories are distinct (one aggregate row each)
    cats = [x["category"] for x in rows]
    assert len(cats) == len(set(cats))


def test_analytics_daily_totals_days_param(client):
    r = client.get("/api/v1/analytics/daily-totals?days=7")
    assert r.status_code == 200 and r.json["filters"] == {"days": 7}
    days = [x["day"] for x in r.json["data"]]
    assert 1 <= len(days) <= 7
    assert days == sorted(days)
    # invalid days -> 400 (reference analytics.py:33-35)
    assert client.get("/api/v1/analytics/daily-totals?days=0").status_code == 400


def test_analytics_users_pagination_contract(client):
    r = client.get(
        "/api/v1/analytics/users?min_transactions=2&page=1&per_page=5"
    )
    assert r.status_code == 200
    pg = r.json["pagination"]
    assert pg["page"] == 1 and pg["per_page"] == 5
    assert len(r.json["data"]) == min(5, pg["total"])
    assert pg["pages"] * 5 >= pg["total"]
    # page 2 returns the NEXT disjoint user_ids in order
    r2 = client.get(
        "/api/v1/analytics/users?min_transactions=2&page=2&per_page=5"
    )
    ids1 = [x["user_id"] for x in r.json["data"]]
    ids2 = [x["user_id"] for x in r2.json["data"]]
    assert not set(ids1) & set(ids2)
    if ids1 and ids2:
        assert max(ids1) < min(ids2)
    # every returned row respects the HAVING threshold
    assert all(x["transaction_count"] >= 2 for x in r.json["data"])


def test_analytics_users_filters(client):
    r = client.get(
        "/api/v1/analytics/users?transaction_type=UPI&min_amount=50&days=30"
    )
    assert r.status_code == 200
    assert r.json["filters"]["transaction_type"] == "UPI"
    assert client.get("/api/v1/analytics/users?page=0").status_code == 400


# --------------------------------------------------------- transactions
# reference backend/app/api/transactions.py:7-35 — bare
# paginated_response envelope, per-source listings, detail by id


def test_transactions_listing_envelope_and_pagination(client):
    r = client.get("/api/v1/transactions/upi?page=1&per_page=4")
    assert r.status_code == 200
    body = r.json
    assert set(body) == {"items", "total", "pages", "current_page", "per_page"}
    assert body["current_page"] == 1 and body["per_page"] == 4
    assert len(body["items"]) == min(4, body["total"])
    assert all(x["transaction_type"] == "UPI" for x in body["items"])
    ids = [x["transaction_id"] for x in body["items"]]
    assert ids == sorted(ids)
    # second page disjoint and ordered after the first
    r2 = client.get("/api/v1/transactions/upi?page=2&per_page=4")
    ids2 = [x["transaction_id"] for x in r2.json["items"]]
    assert not set(ids) & set(ids2)
    if ids and ids2:
        assert max(ids) < min(ids2)


def test_transactions_sources_partition_the_view(client):
    upi = client.get("/api/v1/transactions/upi?per_page=1").json["total"]
    cc = client.get("/api/v1/transactions/credit-card?per_page=1").json["total"]
    total = client.get("/api/v1/analytics/summary").json["data"][
        "total_transactions"
    ]
    assert upi + cc == total


def test_transaction_detail_roundtrip(client):
    first = client.get("/api/v1/transactions/upi?per_page=1").json["items"][0]
    tid = first["transaction_id"]
    got = client.get(f"/api/v1/transactions/upi/{tid}")
    assert got.status_code == 200 and got.json == first
    # an id from the other source 404s on this route
    cc = client.get("/api/v1/transactions/credit-card?per_page=1").json["items"][0]
    assert (
        client.get(f"/api/v1/transactions/upi/{cc['transaction_id']}").status_code
        == 404
    )


def test_segment_detail_routes_match_reference_envelope(client):
    """GET /segments/<id> and /segments/by_rule/<rule_id> (reference
    backend/app/api/segments.py:32,47) return the SegmentCatalog.to_dict
    key set; unknown ids 404."""
    r = client.post(
        "/api/v1/rules", json={"rule_name": "seg_detail", "conditions": [AMT]}
    )
    rid = r.json["data"]["id"]
    client.post(f"/api/v1/rules/{rid}/trigger")
    expected_keys = {
        "id", "segment_name", "description", "table_name", "row_count",
        "rule_id", "sql_query", "refresh_frequency", "last_refreshed_at",
        "created_at", "operation", "dependencies",
    }
    by_id = client.get(f"/api/v1/segments/{rid}")
    assert by_id.status_code == 200 and by_id.json["status"] == "success"
    data = by_id.json["data"]
    assert set(data) == expected_keys
    assert data["rule_id"] == rid and data["id"] == rid
    assert data["row_count"] >= 0 and data["dependencies"] == []
    by_rule = client.get(f"/api/v1/segments/by_rule/{rid}")
    assert by_rule.status_code == 200 and by_rule.json["data"] == data
    assert client.get("/api/v1/segments/99999").status_code == 404
    assert client.get("/api/v1/segments/by_rule/99999").status_code == 404


def test_transaction_payload_carries_merchant_name(client):
    first = client.get("/api/v1/transactions/upi?per_page=1").json["items"][0]
    # reference to_dict (backend/app/models/transactions.py:17-28)
    assert first["merchant_name"].startswith("merchant_")
    tid = first["transaction_id"]
    assert first["merchant_name"] == f"merchant_{tid % 97}"


def test_transactions_routes_501_without_detail_source(spark, sf_dir, tmp_path):
    txns = unified_transactions_from_events(load_table(spark, sf_dir, "events"))
    engine = AudienceEngine(spark, Catalog(str(tmp_path / "cat2")), lambda: txns)
    app = create_app(engine)
    app.config["TESTING"] = True
    c = app.test_client()
    assert c.get("/api/v1/transactions/upi").status_code == 501
    # analytics remain fully served without the detail source
    assert c.get("/api/v1/analytics/summary").status_code == 200
