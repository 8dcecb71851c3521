"""tpuclip.client.Client against a live SearchServer."""

import io

import numpy as np
import pytest
from PIL import Image

from tpuclip.client import Client, ServeError
from tpuclip.engine import ImageDatabase
from tpuclip.serve import SearchServer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    home = tmp_path_factory.mktemp("client")
    imgs = home / "imgs"
    imgs.mkdir()
    for name, c in [("red.jpg", (220, 30, 30)), ("green.png", (30, 200, 30))]:
        Image.new("RGB", (64, 64), c).save(imgs / name)
    eng = ImageDatabase(
        db_path=str(home / "c.db"),
        model_cache_dir=str(home / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(imgs), inference_batch_size=4)
    srv = SearchServer(eng, host="127.0.0.1", port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


@pytest.fixture()
def client(server):
    return Client(f"http://127.0.0.1:{server.port}", timeout=30.0)


def test_health_and_stats(client):
    assert client.health()["status"] == "ok"
    stats = client.stats()
    assert stats["images"] == 2 and stats["embedding_dim"] > 0


def test_search(client):
    results = client.search("a red square", k=2)
    assert len(results) == 2
    assert all(isinstance(p, str) and isinstance(s, float) for p, s in results)
    # Algebra params travel through.
    results = client.search("a red square", k=1, negative="green grass")
    assert len(results) == 1


def test_search_batch(client):
    batches = client.search_batch(["red", "green"], k=2)
    assert len(batches) == 2 and all(len(b) == 2 for b in batches)


def test_embed_texts(client):
    vecs = client.embed_texts(["a dog", "a cat"])
    assert vecs.shape[0] == 2 and vecs.dtype == np.float32
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, atol=1e-4)


def test_search_image_bytes(client):
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (210, 40, 40)).save(buf, format="JPEG")
    results = client.search_image_bytes(buf.getvalue(), k=2)
    assert len(results) == 2


def test_embed_image_bytes_list_contains_failures(client):
    buf = io.BytesIO()
    Image.new("RGB", (16, 16), (1, 2, 3)).save(buf, format="PNG")
    out = client.embed_image_bytes_list([buf.getvalue(), b"not an image"])
    assert out[0] is not None and out[0].dtype == np.float32
    assert out[1] is None


def test_search_image_bytes_batch(client):
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (210, 40, 40)).save(buf, format="JPEG")
    out = client.search_image_bytes_batch([buf.getvalue(), b"not an image"], k=2)
    assert len(out) == 2
    assert out[0] is not None and len(out[0]) == 2
    assert out[1] is None


def test_classify_image_bytes(client):
    buf = io.BytesIO()
    Image.new("RGB", (32, 32), (210, 40, 40)).save(buf, format="JPEG")
    labels = ["red", "green"]
    ranked = client.classify_image_bytes(buf.getvalue(), labels)
    assert sorted(l for l, _, _ in ranked) == sorted(labels)
    probs = [p for _, p, _ in ranked]
    assert probs == sorted(probs, reverse=True)
    assert all(0.0 <= p <= 1.0 for p in probs)


def test_server_errors_surface(client):
    with pytest.raises(ServeError) as e:
        client.search("")  # missing query string
    assert e.value.status == 400 and "query" in e.value.message
