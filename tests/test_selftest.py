"""`tpuclip selftest --real-checkpoint` driven end-to-end against the
synthetic real-format artifact directory (same construction as
tests/test_checkpoint_drill.py: genuine HF save_pretrained safetensors +
a real-format sentencepiece tokenizer.model). Proves the bring-up command
works NOW, so the day network access exists, closing SURVEY §2 C3 is one
command (VERDICT r3 item 3)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from test_checkpoint_drill import (  # noqa: E402
    MODEL_NAME,
    TEXT_KW,
    VISION_KW,
    _gemma_style_tokenizer_model,
)

from tpuclip.selftest import run_selftest  # noqa: E402
from tpuclip.text import sentencepiece as sp  # noqa: E402


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    from transformers import SiglipConfig, SiglipModel

    d = tmp_path_factory.mktemp("selftest_ckpt")
    cfg = SiglipConfig.from_text_vision_configs(
        transformers.SiglipTextConfig(**TEXT_KW),
        transformers.SiglipVisionConfig(**VISION_KW),
    )
    torch.manual_seed(7)
    model = SiglipModel(cfg).eval()
    model.save_pretrained(str(d), safe_serialization=True, max_shard_size="200KB")
    (d / "tokenizer.model").write_bytes(
        sp.serialize_model(_gemma_style_tokenizer_model())
    )
    return d


def _statuses(report):
    return {s.name: s.status for s in report.steps}


def test_selftest_passes_on_real_format_artifacts(hf_dir, tmp_path):
    report = run_selftest(
        model_name=MODEL_NAME,
        model_cache_dir=str(tmp_path / "cache"),
        source=str(hf_dir),
        allow_download=False,
        convert_dst=str(tmp_path / "converted"),
    )
    st = _statuses(report)
    assert st["locate"] == "PASS"
    assert st["load"] == "PASS"
    assert st["convert"] == "PASS"
    assert st["tokenizer"] == "PASS"
    # the synthetic dir ships no tokenizer.json — the Rust oracle step
    # must degrade to an explicit SKIP, never a silent pass
    assert st["tokenizer_oracle"] == "SKIP"
    assert st["parity"] == "PASS"
    assert report.ok
    assert "PASS" in report.summary()
    # converted checkpoint is loadable tpuclip-native
    from tpuclip.models.checkpoint import is_tpuclip_checkpoint

    assert is_tpuclip_checkpoint(str(tmp_path / "converted"))


def test_selftest_cache_lookup_path(hf_dir, tmp_path):
    """Without --source it resolves through find_local_checkpoint (the
    reference's local-dir-first contract, image_database.py:192-195)."""
    import shutil

    cache = tmp_path / "cache"
    shutil.copytree(hf_dir, cache / MODEL_NAME.replace("/", "--"))
    report = run_selftest(
        model_name=MODEL_NAME,
        model_cache_dir=str(cache),
        allow_download=False,
        skip_parity=True,
    )
    st = _statuses(report)
    assert st["locate"] == "PASS"
    assert st["parity"] == "SKIP"
    assert report.ok


def test_selftest_fails_cleanly_when_nothing_to_load(tmp_path):
    report = run_selftest(
        model_name=MODEL_NAME,
        model_cache_dir=str(tmp_path / "empty"),
        allow_download=False,
    )
    st = _statuses(report)
    assert st["locate"] == "FAIL"
    assert not report.ok
    assert "FAIL" in report.summary()


def test_selftest_flags_missing_tokenizer_as_failure(hf_dir, tmp_path):
    """Weights without tokenizer files must FAIL the tokenizer step (the
    hash fallback would silently produce garbage embeddings against
    pretrained weights — VERDICT r1 item 6 made this loud; selftest makes
    it fatal)."""
    import shutil

    bare = tmp_path / "bare"
    shutil.copytree(hf_dir, bare)
    (bare / "tokenizer.model").unlink()
    report = run_selftest(
        model_name=MODEL_NAME,
        model_cache_dir=str(tmp_path / "cache"),
        source=str(bare),
        allow_download=False,
        skip_parity=True,
        convert_dst=str(tmp_path / "converted2"),
    )
    st = _statuses(report)
    assert st["tokenizer"] == "FAIL"
    assert not report.ok


def test_selftest_parity_detects_wrong_weights(hf_dir, tmp_path, monkeypatch):
    """The parity step is a real discriminator: when our loaded params and
    the HF oracle's weights genuinely differ (oracle redirected to a
    reseeded model over the same config), the step must FAIL."""
    from transformers import SiglipConfig, SiglipModel

    cfg = SiglipConfig.from_text_vision_configs(
        transformers.SiglipTextConfig(**TEXT_KW),
        transformers.SiglipVisionConfig(**VISION_KW),
    )
    torch.manual_seed(99)  # different weights, same shapes
    reseeded = tmp_path / "reseeded"
    SiglipModel(cfg).eval().save_pretrained(str(reseeded), safe_serialization=True)

    real_fp = SiglipModel.from_pretrained.__func__

    def oracle_from_reseeded(cls, path, *a, **k):
        return real_fp(cls, str(reseeded), *a, **k)

    monkeypatch.setattr(
        SiglipModel, "from_pretrained", classmethod(oracle_from_reseeded)
    )
    report = run_selftest(
        model_name=MODEL_NAME,
        model_cache_dir=str(tmp_path / "cache"),
        source=str(hf_dir),  # our params: original; oracle: reseeded
        allow_download=False,
        convert_dst=str(tmp_path / "converted3"),
    )
    st = _statuses(report)
    assert st["parity"] == "FAIL"
    assert not report.ok


def test_selftest_cli_exit_codes(hf_dir, tmp_path):
    from tpuclip.cli import main

    # pass: returns normally
    main([
        "selftest", "--real-checkpoint",
        "--model", MODEL_NAME,
        "--source", str(hf_dir),
        "--model-cache", str(tmp_path / "cache"),
        "--no-download",
        "--convert-to", str(tmp_path / "conv_cli"),
        "--skip-parity",
    ])
    # fail: exit code 1
    with pytest.raises(SystemExit) as ei:
        main([
            "selftest", "--real-checkpoint",
            "--model", MODEL_NAME,
            "--model-cache", str(tmp_path / "emptycache"),
            "--no-download",
        ])
    assert ei.value.code == 1


def test_selftest_e2e_product_smoke(tmp_path, monkeypatch):
    """`tpuclip selftest --e2e` (VERDICT r4 item 4): scan a bundled tree
    into a temp DB, text + image self-retrieval searches, duplicate
    filter, gallery, integrity check — all PASS on the CPU backend with
    the tiny model at random init."""
    from tpuclip.selftest import run_e2e_selftest

    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    report = run_e2e_selftest(
        "tpuclip/test-tiny", str(tmp_path / "cache"),
        work_dir=str(tmp_path / "work"),
    )
    st = _statuses(report)
    for step in ("e2e_tree", "e2e_scan", "e2e_text_search",
                 "e2e_image_self_retrieval", "e2e_duplicate_filter",
                 "e2e_gallery", "e2e_check"):
        assert st[step] == "PASS", (step, report.steps)
    assert report.ok


def test_strip_edge_specials():
    """Review r5: the helper the tokenizer-oracle comparison depends on
    (was referenced-but-undefined — the oracle step would NameError on any
    real checkpoint shipping tokenizer.json)."""
    from tpuclip.selftest import _strip_edge_specials

    specials = {0, 1, 2}
    assert _strip_edge_specials([2, 5, 6, 1, 0], specials) == [5, 6]
    assert _strip_edge_specials([5, 1, 6], specials) == [5, 1, 6]  # mid kept
    assert _strip_edge_specials([1, 1], specials) == []
    assert _strip_edge_specials([], specials) == []


def test_selftest_e2e_honors_source(hf_dir, tmp_path, monkeypatch):
    """Review r5: `selftest --e2e --source DIR` must run the smoke with the
    supplied checkpoint, not silently fall back to random init."""
    from tpuclip.selftest import run_e2e_selftest

    monkeypatch.setenv("TPUCLIP_HOME", str(tmp_path / "home"))
    report = run_e2e_selftest(
        MODEL_NAME, str(tmp_path / "empty_cache"),
        work_dir=str(tmp_path / "work"), source=str(hf_dir),
    )
    st = _statuses(report)
    assert st["e2e_scan"] == "PASS"
    scan_step = next(s for s in report.steps if s.name == "e2e_scan")
    assert "checkpoint" in scan_step.detail
    assert "random-init" not in scan_step.detail
    assert report.ok
