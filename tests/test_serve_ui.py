"""Browser UI endpoints: GET / page, GET /image access gate + encodings."""

import io
import urllib.error
import urllib.request
from urllib.parse import quote

import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase
from tpuclip.serve import SearchServer


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    home = tmp_path_factory.mktemp("serve_ui")
    imgs = home / "imgs"
    imgs.mkdir()
    Image.new("RGB", (640, 480), (220, 30, 30)).save(imgs / "red.jpg")
    Image.new("RGB", (64, 64), (30, 200, 30)).save(imgs / "green.png")
    Image.new("RGB", (64, 64), (40, 40, 230)).save(imgs / "blue.bmp")
    (imgs / "secret.txt").write_text("not an image row")
    eng = ImageDatabase(
        db_path=str(home / "s.db"),
        model_cache_dir=str(home / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    eng.scan_directory(str(imgs), inference_batch_size=4)
    return eng


@pytest.fixture(scope="module")
def server(engine):
    srv = SearchServer(engine, host="127.0.0.1", port=0)
    srv.start_background()
    yield srv
    srv.shutdown()


def _get(srv, path, headers=None):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}", headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status, dict(r.headers), r.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def _db_path(engine, name: str) -> str:
    conn_paths = engine.store.fetch_paths_for_ids(range(1, 50))
    for p in conn_paths.values():
        if p.endswith(name):
            return p
    raise AssertionError(f"{name} not scanned")


def test_ui_page_served(server):
    for route in ("/", "/ui"):
        status, headers, body = _get(server, route)
        assert status == 200
        assert headers["Content-Type"].startswith("text/html")
        text = body.decode()
        assert "/search" in text and "/image?path=" in text
        assert "<form" in text
        assert "more like this" in text  # per-result image-similarity action


def test_image_raw_bytes(server, engine):
    p = _db_path(engine, "red.jpg")
    status, headers, body = _get(server, f"/image?path={quote(p)}")
    assert status == 200
    assert headers["Content-Type"] == "image/jpeg"
    im = Image.open(io.BytesIO(body))
    assert im.size == (640, 480)


def test_image_resized(server, engine):
    p = _db_path(engine, "red.jpg")
    status, headers, body = _get(server, f"/image?path={quote(p)}&size=100")
    assert status == 200
    assert headers["Content-Type"] == "image/jpeg"
    im = Image.open(io.BytesIO(body))
    assert max(im.size) <= 100


def test_image_gate_rejects_non_db_paths(server, engine, tmp_path):
    # A real file that is NOT an images-table row must 404: the DB is the
    # access-control list (serve_ui.py docstring).
    outside = tmp_path / "outside.jpg"
    Image.new("RGB", (8, 8)).save(outside)
    status, _, _ = _get(server, f"/image?path={quote(str(outside))}")
    assert status == 404
    # Sibling file in the scanned tree, but not an image row.
    secret = _db_path(engine, "red.jpg").replace("red.jpg", "secret.txt")
    status, _, _ = _get(server, f"/image?path={quote(secret)}")
    assert status == 404
    status, _, _ = _get(server, "/image?path=")
    assert status == 400


def test_image_bmp_served_as_thumbnail_jpeg(server, engine):
    # BMP is in the gallery's thumbnail set — the browser gets a JPEG.
    p = _db_path(engine, "blue.bmp")
    status, headers, body = _get(server, f"/image?path={quote(p)}")
    assert status == 200
    assert Image.open(io.BytesIO(body)).format == "JPEG"


def test_image_etag_304(server, engine):
    p = _db_path(engine, "green.png")
    status, headers, _ = _get(server, f"/image?path={quote(p)}")
    assert status == 200 and "ETag" in headers
    status, _, body = _get(
        server,
        f"/image?path={quote(p)}",
        headers={"If-None-Match": headers["ETag"]},
    )
    assert status == 304 and body == b""


def test_lookup_image_store_api(engine):
    p = _db_path(engine, "green.png")
    row = engine.store.lookup_image(p)
    assert row is not None and row[0] >= 1
    assert engine.store.lookup_image(p + ".nope") is None
