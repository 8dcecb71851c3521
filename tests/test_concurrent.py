"""Concurrent reads during writes — the reference's WAL story
(image_database.py:253, README.md:136): a search session keeps working while
a scan commits into the same database."""

import threading

import numpy as np
import pytest
from PIL import Image

from tpuclip.engine import ImageDatabase


def test_search_during_scan(tmp_path):
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for i in range(40):
        Image.new("RGB", (32, 32), (i * 6 % 255, 90, 120)).save(imgs / f"im_{i:03d}.png")

    writer = ImageDatabase(
        db_path=str(tmp_path / "w.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )
    # seed a few rows so the reader has something before the scan starts
    writer.scan_directory(str(imgs), inference_batch_size=4, limit=8)

    reader = ImageDatabase(
        db_path=str(tmp_path / "w.db"),
        model_cache_dir=str(tmp_path / "models"),
        model_name="tpuclip/test-tiny",
        inference_batch_size=4,
    )

    errors = []

    def scan_rest():
        try:
            writer.scan_directory(str(imgs), inference_batch_size=4, batch_size=4)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    t = threading.Thread(target=scan_rest)
    t.start()
    results_seen = []
    try:
        while t.is_alive():
            res = reader.search("a colored square", k=5, show_duplicates=True)
            assert all(np.isfinite(s) for _, s in res)
            results_seen.append(len(res))
    finally:
        t.join(timeout=60)
    assert not errors, errors
    assert writer.store.count_images() == 40
    # reader worked throughout and eventually saw a growing index
    assert results_seen and max(results_seen) == 5
    final = reader.search("a colored square", k=10, show_duplicates=True)
    assert len(final) == 10
