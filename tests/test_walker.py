"""Walker census and sequence-sampling heuristic (image_database.py:606-847)."""

from pathlib import Path

import pytest

from tpuclip.io.walker import census, group_by_folder, sample_folder_sequences


def _paths(folder: str, names):
    return [Path(folder) / n for n in names]


class TestSequenceSampler:
    def test_small_folders_untouched(self):
        files = _paths("/x/frames", [f"frame_{i:04d}.jpg" for i in range(150)])
        assert sample_folder_sequences(files) == files

    def test_sequence_folder_sampled_every_100th(self):
        files = _paths("/x/render_output", [f"frame_{i:04d}.jpg" for i in range(500)])
        kept = sample_folder_sequences(files)
        nums = sorted(int(p.stem.split("_")[1]) for p in kept)
        assert nums == [0, 100, 200, 300, 400]

    def test_prefix_keyword_triggers_even_without_folder_keyword(self):
        files = _paths("/x/misc", [f"shot{i:05d}.png" for i in range(300)])
        kept = sample_folder_sequences(files)
        assert len(kept) == 3

    def test_camera_prefixes_never_sampled(self):
        # IMG_#### in a folder named "frames": photoish prefix wins
        files = _paths("/x/frames", [f"IMG_{i:04d}.jpg" for i in range(400)])
        assert sample_folder_sequences(files) == files

    def test_no_keywords_no_sampling(self):
        files = _paths("/x/holiday", [f"pic{i:04d}.jpg" for i in range(400)])
        assert sample_folder_sequences(files) == files

    def test_dominant_fraction_required(self):
        # numbered files exist but prefixes are scattered (<80% dominant)
        names = [f"frame_{i:03d}.jpg" for i in range(100)]
        names += [f"take_{i:03d}.jpg" for i in range(100)]
        names += [f"cut_{i:03d}.jpg" for i in range(100)]
        files = _paths("/x/frames", names)
        assert sample_folder_sequences(files) == files

    def test_non_numbered_always_kept(self):
        names = [f"frame_{i:04d}.jpg" for i in range(300)] + ["notes.png", "readme.jpg"]
        files = _paths("/x/frames", names)
        kept = sample_folder_sequences(files)
        kept_names = {p.name for p in kept}
        assert {"notes.png", "readme.jpg"} <= kept_names
        assert len(kept) == 5  # 3 sampled frames + 2 non-numbered


class TestCensus:
    @pytest.fixture()
    def tree(self, tmp_path):
        for rel in [
            "a/x.jpg", "a/y.PNG", "a/._resource.jpg", "a/notes.txt",
            "b/deep/z.webp", "skip/secret.jpg", "skip/sub/also.jpg",
        ]:
            p = tmp_path / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            p.touch()
        return tmp_path

    def test_extensions_case_insensitive_and_filtered(self, tree):
        files, _ = census(str(tree), extensions={".jpg", ".png", ".webp"})
        names = {f.name for f in files}
        assert names == {"x.jpg", "y.PNG", "z.webp", "secret.jpg", "also.jpg"}

    def test_resource_forks_skipped(self, tree):
        files, _ = census(str(tree), extensions={".jpg"})
        assert not any(f.name.startswith("._") for f in files)

    def test_exclusion_prunes_subtree(self, tree):
        files, excluded = census(
            str(tree), exclude_paths=[str(tree / "skip")],
            extensions={".jpg", ".png", ".webp"},
        )
        assert excluded >= 1
        assert not any("skip" in str(f) for f in files)

    def test_group_by_folder_sorted(self, tree):
        files, _ = census(str(tree), extensions={".jpg", ".png", ".webp"})
        groups = group_by_folder(files)
        keys = [str(k) for k, _ in groups]
        assert keys == sorted(keys)
