"""HTTP serving mode: health/stats/search endpoints against a live server."""

import json
import urllib.error
import urllib.request

import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase
from tpuclip.serve import SearchServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    home = tmp_path_factory.mktemp("serve")
    imgs = home / "imgs"
    imgs.mkdir()
    for name, c in [("red.jpg", (220, 30, 30)), ("green.png", (30, 200, 30)), ("blue.webp", (40, 40, 230))]:
        Image.new("RGB", (64, 64), c).save(imgs / name)
    eng = ImageDatabase(
        db_path=str(home / "s.db"),
        model_cache_dir=str(home / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(imgs), inference_batch_size=4)
    srv = SearchServer(eng, host="127.0.0.1", port=0)  # ephemeral port
    srv.start_background()
    yield srv
    srv.shutdown()


def _get(srv, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}{path}", timeout=10) as r:
        return r.status, json.loads(r.read())


def _post(srv, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_health(server):
    status, body = _get(server, "/health")
    assert status == 200 and body["status"] == "ok"


def test_stats(server):
    status, body = _get(server, "/stats")
    assert status == 200
    assert body["images"] == 3
    assert body["full_embeddings"] == 3
    assert body["embedding_dim"] == 64


def test_search_endpoint(server):
    status, body = _post(server, "/search", {"query": "a red square", "k": 2})
    assert status == 200
    assert len(body["results"]) == 2
    sims = [r["similarity"] for r in body["results"]]
    assert sims == sorted(sims, reverse=True)
    assert all("path" in r for r in body["results"])


def test_search_minilanguage(server):
    status, body = _post(server, "/search", {"query": "red + blue - green", "k": 3})
    assert status == 200
    assert len(body["results"]) == 3


def test_bad_requests(server):
    status, body = _post(server, "/search", {"k": 5})
    assert status == 400 and "query" in body["error"]
    status, _ = _post(server, "/nope", {"query": "x"})
    assert status == 404
    # non-search mini-language lines are rejected
    status, body = _post(server, "/search", {"query": "k:20"})
    assert status == 400


def test_malformed_json(server):
    import urllib.request

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/search",
        data=b"{not json",
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            status = r.status
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_embed_endpoint(server):
    status, body = _post(server, "/embed", {"texts": ["red", "blue"]})
    assert status == 200
    assert body["dim"] == 64
    import numpy as np

    e = np.array(body["text_embeddings"])
    assert e.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(e, axis=1), 1.0, rtol=1e-4)
    status, body = _post(server, "/embed", {})
    assert status == 400


def test_search_batch_endpoint(server):
    status, body = _post(server, "/search_batch", {"queries": ["red", "green", "blue"], "k": 2})
    assert status == 200
    assert len(body["results"]) == 3
    assert all(len(r) == 2 for r in body["results"])
    status, _ = _post(server, "/search_batch", {"queries": "notalist"})
    assert status == 400


def test_stats_metrics_counters(server):
    _post(server, "/search", {"query": "metric probe", "k": 1})
    status, body = _get(server, "/stats")
    assert status == 200
    assert body["requests"] >= 1
    assert body["searches"] >= 1
    assert "search_p50_ms" in body
