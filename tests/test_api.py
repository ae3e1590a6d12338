"""S8 HTTP facade: the reference's endpoint surface served by the engine.

Drives the real HTTP server (ephemeral port) with stdlib urllib — request
and response shapes are the reference's schemas (src/api/schemas.py), the
data operations underneath are the engine's store/search plans.
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from robi_biometric_qdrant_vector_db_service_spark.api import VectorService


def _call(port: int, method: str, path: str, body: dict | None = None) -> dict:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/api/v1{path}",
        method=method,
        data=json.dumps(body).encode() if body is not None else None,
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    svc = VectorService(spark, str(tmp_path_factory.mktemp("api_store")))
    srv, port = svc.start_background()
    yield svc, port
    srv.shutdown()


def test_http_add_search_delete_roundtrip(served):
    _, port = served

    r = _call(port, "POST", "/vectors/add", {
        "embedding": [1.0, 0.0, 0.0, 0.0],
        "user_id": "alice",
        "metadata": {"source": "enroll"},
        "point_id": "p-alice",
    })
    assert r["success"] and r["point_id"] == "p-alice"

    r = _call(port, "POST", "/vectors/add_batch", {
        "embeddings": [[0.0, 1.0, 0.0, 0.0], [0.9, 0.1, 0.0, 0.0]],
        "user_ids": ["bob", "carol"],
    })
    assert r["success"] and r["added_count"] == 2 and len(r["point_ids"]) == 2

    r = _call(port, "POST", "/vectors/search", {
        "embedding": [1.0, 0.0, 0.0, 0.0], "k": 2,
    })
    assert r["success"] and r["total_results"] == 2
    top = r["results"][0]
    assert top["id"] == "p-alice" and top["user_id"] == "alice"
    assert top["metadata"] == {"source": "enroll"}
    assert top["score"] == pytest.approx(1.0, abs=1e-6)
    assert r["results"][1]["user_id"] == "carol"  # 0.9-cos neighbor

    # filtered search only sees the filtered user's bucket
    r = _call(port, "POST", "/vectors/search", {
        "embedding": [1.0, 0.0, 0.0, 0.0], "k": 5, "user_filter": "bob",
    })
    assert [h["user_id"] for h in r["results"]] == ["bob"]

    # threshold drops the orthogonal vector
    r = _call(port, "POST", "/vectors/search", {
        "embedding": [1.0, 0.0, 0.0, 0.0], "k": 5, "threshold": 0.5,
    })
    assert {h["user_id"] for h in r["results"]} == {"alice", "carol"}

    r = _call(port, "DELETE", "/vectors/p-alice")
    assert r["success"] and r["deleted"] is True
    r = _call(port, "DELETE", "/vectors/user/bob")
    assert r["success"] and r["deleted_count"] == 1

    r = _call(port, "POST", "/vectors/search", {
        "embedding": [1.0, 0.0, 0.0, 0.0], "k": 5,
    })
    assert {h["user_id"] for h in r["results"]} == {"carol"}


def test_http_stats_health_info_and_errors(served):
    _, port = served

    r = _call(port, "GET", "/stats")
    assert r["success"]
    assert r["collection_info"]["total_vectors"] >= 1
    assert r["performance_stats"]["search"]["count"] >= 1
    assert r["gpu_info"] == {"gpu_available": False, "engine": "spark"}

    r = _call(port, "GET", "/health")
    assert r["status"] == "healthy" and r["collection_exists"]

    r = _call(port, "GET", "/info")
    assert r["engine"] == "pyspark" and r["api_version"] == "v1"

    # malformed request -> 422 with a message, like the reference's
    # validation layer
    import urllib.error

    with pytest.raises(urllib.error.HTTPError) as e:
        _call(port, "POST", "/vectors/add_batch", {
            "embeddings": [[1.0, 0.0]], "user_ids": ["a", "b"],
        })
    assert e.value.code == 422

    with pytest.raises(urllib.error.HTTPError) as e:
        _call(port, "GET", "/nope")
    assert e.value.code == 404
