"""Packed embedding-matrix cache.

sqlite-vec re-scans BLOB rows inside SQLite on every query
(image_database.py:1564-1574). TPU-native replacement: embeddings live in a
packed on-disk matrix that memory-maps instantly and uploads to device HBM
once per session; queries are then a single fused matmul+top-k on device.

Layout, per database ``<db>.cache/``:
    vectors.f32   raw little-endian float32, shape (n, dim), image_id order
    ids.i64       raw int64 image_ids, ascending
    bits.u8       packed sign bits, shape (n, dim // 8) (np.packbits order)
    manifest.json {"count": n, "max_image_id": m, "dim": d, "version": 1}

The cache is append-only-refreshable: new rows committed since the manifest
stamp are appended from SQLite; any other mismatch triggers a full rebuild.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from tpuclip.index.store import MetadataStore
from tpuclip.utils.logging import log

_VERSION = 1


class MatrixCache:
    def __init__(self, store: MetadataStore, cache_dir: Optional[str] = None):
        self.store = store
        self.cache_dir = Path(cache_dir) if cache_dir else Path(str(store.db_path) + ".cache")

    # ----------------------------------------------------------------- paths

    @property
    def _manifest_path(self) -> Path:
        return self.cache_dir / "manifest.json"

    def _read_manifest(self) -> Optional[dict]:
        try:
            with open(self._manifest_path, "r", encoding="utf-8") as f:
                m = json.load(f)
            if m.get("version") != _VERSION:
                return None
            return m
        except (OSError, json.JSONDecodeError):
            return None

    def _write_manifest(self, count: int, max_id: int, dim: int, bin_count: int, bin_max_id: int) -> None:
        tmp = self._manifest_path.with_suffix(".tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(
                {
                    "version": _VERSION,
                    "count": count,
                    "max_image_id": max_id,
                    "dim": dim,
                    "bin_count": bin_count,
                    "bin_max_image_id": bin_max_id,
                },
                f,
            )
        os.replace(tmp, self._manifest_path)

    # ------------------------------------------------------------------ load

    def load(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (ids[int64, n], vectors[float32 memmap, (n, dim)]),
        refreshing the cache from SQLite if stale."""
        self.refresh()
        m = self._read_manifest()
        if m is None or m["count"] == 0:
            dim = self.store.embedding_dim
            return np.empty((0,), np.int64), np.empty((0, dim), np.float32)
        n, dim = m["count"], m["dim"]
        ids = np.fromfile(self.cache_dir / "ids.i64", dtype=np.int64, count=n)
        vectors = np.memmap(
            self.cache_dir / "vectors.f32", dtype=np.float32, mode="r", shape=(n, dim)
        )
        return ids, vectors

    def load_binary(self) -> Tuple[np.ndarray, np.ndarray]:
        """Return (ids[int64, n], packed_bits[uint8 memmap, (n, dim//8)])."""
        self.refresh()
        m = self._read_manifest()
        dim = self.store.embedding_dim
        if m is None or m.get("bin_count", 0) == 0:
            return np.empty((0,), np.int64), np.empty((0, dim // 8), np.uint8)
        n = m["bin_count"]
        dim = m["dim"]
        ids = np.fromfile(self.cache_dir / "bin_ids.i64", dtype=np.int64, count=n)
        bits = np.memmap(
            self.cache_dir / "bits.u8", dtype=np.uint8, mode="r", shape=(n, dim // 8)
        )
        return ids, bits

    # --------------------------------------------------------------- refresh

    def refresh(self) -> None:
        count, max_id = self.store.embeddings_fingerprint()
        bin_count, bin_max_id = self.store.binary_fingerprint()
        m = self._read_manifest()
        dim = self.store.embedding_dim

        fresh = (
            m is not None
            and m["count"] == count
            and m["max_image_id"] == max_id
            and m["dim"] == dim
            and m.get("bin_count") == bin_count
            and m.get("bin_max_image_id") == bin_max_id
        )
        if fresh:
            return

        self.cache_dir.mkdir(parents=True, exist_ok=True)

        appendable = (
            m is not None
            and m["dim"] == dim
            and m["count"] <= count
            and m["max_image_id"] <= max_id
            and m.get("bin_count", 0) <= bin_count
            and (self.cache_dir / "vectors.f32").exists()
        )
        if appendable:
            start_id = m["max_image_id"]
            bin_start_id = m.get("bin_max_image_id", 0)
            mode = "ab"
        else:
            start_id = 0
            bin_start_id = 0
            mode = "wb"
            for name in ("vectors.f32", "ids.i64", "bits.u8", "bin_ids.i64"):
                p = self.cache_dir / name
                if p.exists():
                    p.unlink()

        new_rows = 0
        with open(self.cache_dir / "vectors.f32", mode) as vf, open(
            self.cache_dir / "ids.i64", mode
        ) as idf:
            for ids, vecs in self.store.iter_embeddings(min_image_id=start_id):
                vf.write(np.ascontiguousarray(vecs, dtype=np.float32).tobytes())
                idf.write(ids.tobytes())
                new_rows += len(ids)

        bin_rows = 0
        with open(self.cache_dir / "bits.u8", mode) as bf, open(
            self.cache_dir / "bin_ids.i64", mode
        ) as bidf:
            for ids, bits in self.store.iter_binary_embeddings(min_image_id=bin_start_id):
                packed = np.packbits(bits.astype(np.uint8), axis=1)
                bf.write(np.ascontiguousarray(packed).tobytes())
                bidf.write(ids.tobytes())
                bin_rows += len(ids)

        if new_rows or bin_rows or m is None:
            log(
                f"  Matrix cache refreshed: +{new_rows} vectors, +{bin_rows} binary rows "
                f"({count:,} total)"
            )
        self._write_manifest(count, max_id, dim, bin_count, bin_max_id)
