"""Config loading and path resolution semantics (image_database.py:27-121)."""

import json
from pathlib import Path

import pytest

from tpuclip.config import (
    DEFAULT_CONFIG,
    get_paths,
    list_db_files,
    load_config,
    resolve_db_dir,
    resolve_db_path,
    resolve_path,
)


def test_defaults_when_missing(tmp_path):
    cfg = load_config(tmp_path / "nonexistent")
    assert cfg == DEFAULT_CONFIG


def test_config_beside_base_dir(tmp_path):
    base = tmp_path / "repo"
    base.mkdir()
    (base / "config.json").write_text(json.dumps({"database_dir": "/dbs"}))
    assert load_config(base)["database_dir"] == "/dbs"


def test_config_one_dir_up(tmp_path):
    base = tmp_path / "repo"
    base.mkdir()
    (tmp_path / "config.json").write_text(json.dumps({"results_dir": "r2"}))
    assert load_config(base)["results_dir"] == "r2"


def test_beside_wins_over_parent(tmp_path):
    base = tmp_path / "repo"
    base.mkdir()
    (base / "config.json").write_text(json.dumps({"results_dir": "near"}))
    (tmp_path / "config.json").write_text(json.dumps({"results_dir": "far"}))
    assert load_config(base)["results_dir"] == "near"


def test_malformed_config_falls_back(tmp_path, capsys):
    base = tmp_path / "repo"
    base.mkdir()
    (base / "config.json").write_text("{not json")
    assert load_config(base) == DEFAULT_CONFIG


def test_resolve_path():
    assert resolve_path("", Path("/base")) == ""
    assert resolve_path("/abs/x", Path("/base")) == "/abs/x"
    assert resolve_path("rel/x", Path("/base")) == "/base/rel/x"


def test_resolve_db_dir_legacy_database_path():
    # back-compat: database_path's parent becomes the db dir
    out = resolve_db_dir("", Path("/base"), {"database_path": "dbs/main.db"})
    assert out == "/base/dbs"
    assert resolve_db_dir("", Path("/base"), {}) == "/base"
    assert resolve_db_dir("explicit", Path("/base"), {}) == "/base/explicit"


def test_resolve_db_path():
    assert resolve_db_path("/x/a.db", None, "/dbs") == "/x/a.db"
    assert resolve_db_path(None, "cats", "/dbs") == "/dbs/cats.db"
    assert resolve_db_path(None, "cats.DB", "/dbs") == "/dbs/cats.DB"
    with pytest.raises(ValueError):
        resolve_db_path(None, None, "/dbs")


def test_list_db_files(tmp_path):
    (tmp_path / "b.db").touch()
    (tmp_path / "a.DB").touch()
    (tmp_path / "c.txt").touch()
    (tmp_path / "sub").mkdir()
    assert list_db_files(str(tmp_path)) == ["a.DB", "b.db"]
    assert list_db_files(str(tmp_path / "missing")) == []


def test_get_paths_output_base_is_parent(tmp_path):
    base = tmp_path / "repo"
    base.mkdir()
    p = get_paths(base, dict(DEFAULT_CONFIG))
    assert p.output_base == str(tmp_path)
    assert p.model_cache_dir == str(tmp_path / "models")
    assert p.db_path.endswith("image_database.db")
