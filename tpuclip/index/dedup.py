"""Search-result duplicate filtering.

Same semantics as ``_filter_duplicates`` (image_database.py:1207-1306):
default-on at search time, compares binary (sign) embeddings of the result
set pairwise, treats rows within ``tolerance_bits`` Hamming distance as
duplicates, keeps the higher-similarity member, and re-sorts. Results without
binary rows are always kept. The pairwise work is O(k²) over at most a few
hundred rows — vectorized numpy popcount on packed bits.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from tpuclip.index.store import MetadataStore
from tpuclip.ops.hamming import hamming_distance_packed, pack_bits
from tpuclip.utils.logging import log

DEFAULT_TOLERANCE_BITS = 2


def filter_duplicates(
    store: MetadataStore,
    results: List[Tuple[str, float]],
    tolerance_bits: int = DEFAULT_TOLERANCE_BITS,
) -> List[Tuple[str, float]]:
    if len(results) == 0:
        return results

    binaries = store.fetch_binary_for_paths([fp for fp, _ in results])

    kept: List[Tuple[str, float]] = []  # results that had no binary row
    packed_rows: List[np.ndarray] = []
    packed_items: List[Tuple[str, float]] = []
    for file_path, similarity in results:
        bits = binaries.get(file_path)
        if bits is None:
            kept.append((file_path, similarity))
        else:
            packed_rows.append(pack_bits(bits))
            packed_items.append((file_path, similarity))

    duplicates_removed = 0
    chosen: List[int] = []  # indices into packed_items of cluster champions
    for i, (file_path, similarity) in enumerate(packed_items):
        match = -1
        for ci, champ_idx in enumerate(chosen):
            d = int(hamming_distance_packed(packed_rows[i], packed_rows[champ_idx]))
            if d <= tolerance_bits:
                match = ci
                break
        if match < 0:
            chosen.append(i)
        else:
            champ_idx = chosen[match]
            if similarity > packed_items[champ_idx][1]:
                chosen[match] = i  # better member becomes the champion
            duplicates_removed += 1

    filtered = kept + [packed_items[i] for i in chosen]
    if duplicates_removed > 0:
        log(f"Filtered out {duplicates_removed} duplicate(s) (tolerance: {tolerance_bits} bits)")
    filtered.sort(key=lambda x: x[1], reverse=True)
    return filtered
