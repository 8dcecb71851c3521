"""`scan --watch`: quiet rescan passes and the CLI watch loop."""

import sys
import time

import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase


@pytest.fixture()
def tree(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    Image.new("RGB", (32, 32), (200, 30, 30)).save(imgs / "a.jpg")
    Image.new("RGB", (32, 32), (30, 200, 30)).save(imgs / "b.png")
    return tmp_path, imgs


def _engine(tmp_path):
    return ImageDatabase(
        db_path=str(tmp_path / "w.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )


def test_scan_returns_state_and_quiet_rescan(tree, capsys):
    tmp_path, imgs = tree
    eng = _engine(tmp_path)
    state = eng.scan_directory(str(imgs), inference_batch_size=4)
    assert state["processed"] == 2 and not state["interrupted"]

    capsys.readouterr()
    # Nothing new: a quiet pass reports 2 skipped and prints no banners.
    state = eng.scan_directory(str(imgs), inference_batch_size=4, verbose=False)
    assert state["processed"] == 0 and state["skipped"] == 2
    out = capsys.readouterr().out
    assert "Starting Directory Scan" not in out and "Scan Complete" not in out

    # A new file is picked up by the next quiet pass.
    Image.new("RGB", (32, 32), (30, 30, 200)).save(imgs / "c.jpg")
    state = eng.scan_directory(str(imgs), inference_batch_size=4, verbose=False)
    assert state["processed"] == 1 and state["skipped"] == 2
    assert eng.store.count_images() == 3


def test_scan_missing_dir_returns_none(tree):
    tmp_path, _ = tree
    eng = _engine(tmp_path)
    assert eng.scan_directory(str(tmp_path / "nope")) is None


def test_watch_cli_indexes_file_added_later(tree, monkeypatch, capsys):
    tmp_path, imgs = tree
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    monkeypatch.setenv("TPUCLIP_WATCH_MAX_LOOPS", "1")
    monkeypatch.setenv("TPUCLIP_MODEL", "tpuclip/test-tiny")

    def fake_sleep(seconds):
        # The watch loop sleeps before each rescan — drop the new file here.
        if not (imgs / "late.jpg").exists():
            Image.new("RGB", (32, 32), (120, 120, 30)).save(imgs / "late.jpg")

    monkeypatch.setattr(time, "sleep", fake_sleep)
    from tpuclip.cli import main

    db_path = str(tmp_path / "w.db")
    monkeypatch.setattr(
        sys,
        "argv",
        ["tpuclip", "scan", str(imgs), "--db", db_path,
         "--model-cache", str(tmp_path / "models"),
         "--inference-batch-size", "4", "--watch", "1"],
    )
    main()
    out = capsys.readouterr().out
    assert "Watching" in out
    assert "[watch" in out and "indexed 1 new images" in out

    import sqlite3

    conn = sqlite3.connect(db_path)
    paths = [r[0] for r in conn.execute("SELECT file_path FROM images")]
    conn.close()
    assert len(paths) == 3 and any(p.endswith("late.jpg") for p in paths)
