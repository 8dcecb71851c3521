"""CLI golden tests: drive main() for scan/search surfaces (SURVEY.md §4.4)."""

import sys

import numpy as np
import pytest
from PIL import Image

from tpuclip.cli import main


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    monkeypatch.setenv("TPUCLIP_MODEL", "tpuclip/test-tiny")
    monkeypatch.setenv("TPUCLIP_INIT", "random")
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)  # golden tests read stdout
    imgs = tmp_path / "imgs"
    imgs.mkdir()
    for name, c in [("red.jpg", (220, 30, 30)), ("green.png", (30, 200, 30)), ("blue.webp", (40, 40, 230))]:
        Image.new("RGB", (64, 64), c).save(imgs / name)
    return tmp_path


def test_scan_then_search_single_shot(env, capsys):
    home = env / "home"
    main(["scan", str(env / "imgs"), "--db-name", "g", "--inference-batch-size", "4", "--profile"])
    out = capsys.readouterr().out
    assert "Scan Complete!" in out
    assert "Processed: 3 images" in out
    assert "Throughput:" in out

    main(["search", "something red", "--db-name", "g", "-k", "2", "--no-session", "--profile"])
    out = capsys.readouterr().out
    assert "Found 2 results" in out
    assert "Results saved to" in out
    assert "Search Performance Profile" in out
    results = list((home / "results").glob("something_red*.html"))
    assert len(results) == 1


def test_scan_requires_db_selection(env, capsys):
    with pytest.raises(SystemExit) as exc:
        main(["scan", str(env / "imgs")])
    assert exc.value.code == 2
    out = capsys.readouterr().out
    assert "No database selected" in out


def test_search_missing_db_lists_available(env, capsys):
    # create one db so the listing shows it
    main(["scan", str(env / "imgs"), "--db-name", "exists", "--inference-batch-size", "4"])
    capsys.readouterr()
    with pytest.raises(SystemExit) as exc:
        main(["search", "x", "--db-name", "missing", "--no-session"])
    assert exc.value.code == 2
    out = capsys.readouterr().out
    assert "does not exist" in out
    assert "exists.db" in out


def test_search_invalid_schema_rejected(env, capsys, tmp_path):
    import sqlite3

    bad = tmp_path / "bad.db"
    conn = sqlite3.connect(bad)
    conn.execute("CREATE TABLE other (x)")
    conn.commit()
    conn.close()
    with pytest.raises(SystemExit) as exc:
        main(["search", "x", "--db", str(bad), "--no-session"])
    assert exc.value.code == 2
    out = capsys.readouterr().out
    assert "does not contain the expected schema" in out


def test_search_binary_only_db(env, capsys):
    main(["scan", str(env / "imgs"), "--db-name", "bin", "--binary-only", "--inference-batch-size", "4"])
    capsys.readouterr()
    main(["search", "green", "--db-name", "bin", "-k", "3", "--no-session"])
    out = capsys.readouterr().out
    assert "Found 3 results" in out


def test_help_without_mode(env, capsys):
    main([])
    out = capsys.readouterr().out
    assert "scan" in out and "search" in out


def test_classify_command(env, capsys):
    from PIL import Image as _Image

    img = env / "imgs" / "red.jpg"
    main(["classify", str(img), "--labels", "a red square, a green square, a blue square"])
    out = capsys.readouterr().out
    assert "Zero-shot classification" in out
    assert out.count("%") >= 6  # three labels, two percentages each
    assert "a red square" in out


def test_info_command(env, capsys):
    main(["scan", str(env / "imgs"), "--db-name", "infod", "--inference-batch-size", "4"])
    capsys.readouterr()
    main(["info", "--db-name", "infod"])
    out = capsys.readouterr().out
    assert "Images:            3" in out
    assert "Full embeddings:   3" in out
    assert "Embedding dim:     64" in out


def test_gc_decode_cache_bad_path_errors(tmp_path, monkeypatch):
    """Review r5: an explicitly passed --decode-cache that is not a
    directory must exit 2, not silently skip the GC."""
    import pytest

    from tpuclip.cli import main as cli_main

    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    with pytest.raises(SystemExit) as exc:
        cli_main(["gc", "--decode-cache", str(tmp_path / "no_such_dir"),
                  "--decode-cache-max-gb", "1"])
    assert exc.value.code == 2
