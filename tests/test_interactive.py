"""Interactive session loop driven end-to-end with scripted stdin
(image_database.py:2026-2299 semantics)."""

import numpy as np
import pytest
from PIL import Image

import tpuclip.cli as cli_mod
from tpuclip.cli import main


@pytest.fixture()
def env(tmp_path, monkeypatch):
    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    monkeypatch.setenv("TPUCLIP_MODEL", "tpuclip/test-tiny")
    monkeypatch.delenv("TPUCLIP_QUIET", raising=False)
    imgs = tmp_path / "imgs"
    (imgs / "sub").mkdir(parents=True)
    for name, c in [("red.jpg", (220, 30, 30)), ("green.png", (30, 200, 30))]:
        Image.new("RGB", (64, 64), c).save(imgs / name)
    Image.new("RGB", (64, 64), (10, 10, 200)).save(imgs / "sub" / "blue.png")
    main(["scan", str(imgs), "--db-name", "i", "--inference-batch-size", "4"])
    return tmp_path, imgs


def _run_session(monkeypatch, lines, argv):
    """Drive the REPL with scripted input lines."""
    it = iter(lines)

    def fake_input(prompt=""):
        try:
            return next(it)
        except StopIteration:
            raise EOFError

    monkeypatch.setattr("builtins.input", fake_input)
    monkeypatch.setattr(cli_mod, "is_tty", lambda: True)
    main(argv)


def test_session_commands_and_search(env, monkeypatch, capsys):
    tmp_path, imgs = env
    _run_session(
        monkeypatch,
        [
            "k:2",
            "duplicates:show",
            f"folder:{imgs / 'sub'}",
            "a blue square",
            "folder:clear",
            "red - green",
            "quit",
        ],
        ["search", "--db-name", "i", "--interactive"],
    )
    out = capsys.readouterr().out
    assert "Number of results set to 2" in out
    assert "Duplicate images will be shown" in out
    assert "Added folder filter:" in out
    # folder-filtered search returned only the sub folder image
    assert "sub" in out
    assert "Folder filters cleared" in out
    assert "Negative: green (text)" in out
    assert "Ending session. Goodbye!" in out
    # galleries auto-saved for both searches
    results = list((tmp_path / "home" / "results").glob("*.html"))
    assert len(results) == 2


def test_session_invalid_commands_keep_session(env, monkeypatch, capsys):
    _run_session(
        monkeypatch,
        ["k:notanumber", "duplicates:maybe", "folder:/does/not/exist", "exit"],
        ["search", "--db-name", "i", "--interactive"],
    )
    out = capsys.readouterr().out
    assert "Invalid number" in out
    assert "Invalid option" in out
    assert "Folder does not exist" in out
    assert "Ending session" in out


def test_session_first_cli_query_then_loop(env, monkeypatch, capsys):
    """CLI query consumed first, then the loop continues reading stdin."""
    _run_session(
        monkeypatch,
        ["green", "q"],
        ["search", "a red thing", "--db-name", "i", "-k", "2"],
    )
    out = capsys.readouterr().out
    assert out.count("Found 2 results") == 2  # CLI query + one stdin query
    assert "Processing initial query" in out


def test_session_eof_exits_cleanly(env, monkeypatch, capsys):
    _run_session(monkeypatch, [], ["search", "--db-name", "i", "--interactive"])
    out = capsys.readouterr().out
    assert "Ending session. Goodbye!" in out
