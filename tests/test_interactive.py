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


def test_cli_query_session_command_applies(env, monkeypatch, capsys):
    """A CLI-provided first line that is a session command must be APPLIED
    (the reference checks k:/folder:/duplicates: before treating args.query
    as a query) — previously it was silently swallowed."""
    _run_session(
        monkeypatch,
        ["a red thing", "quit"],
        ["search", "k:2", "--db-name", "i"],
    )
    out = capsys.readouterr().out
    assert "Number of results set to 2" in out
    assert out.count("Found 2 results") == 1


def test_cli_output_does_not_leak_to_later_query(env, monkeypatch, capsys, tmp_path):
    """--output belongs to the CLI-provided query; when that query fails,
    a later interactive query must derive its own filename."""
    target = tmp_path / "mine.html"
    _run_session(
        monkeypatch,
        ["green", "quit"],
        ["search", str(tmp_path / "missing.jpg"), "--image",
         "--db-name", "i", "--output", str(target)],
    )
    out = capsys.readouterr().out
    assert "does not exist" in out  # first (CLI) query failed
    assert "Found" in out  # the interactive query succeeded
    assert not target.exists(), "--output leaked onto the interactive query"


def test_set_k_rejects_nonpositive():
    from tpuclip.cli import parse_interactive_line

    assert parse_interactive_line("k:0").kind == "error"
    assert parse_interactive_line("k:-5").kind == "error"
    assert parse_interactive_line("k:1").kind == "set_k"
