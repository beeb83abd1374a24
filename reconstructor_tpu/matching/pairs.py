"""Image-pair selection.

Parity with the reference's ``ImageMatcher`` stage: the only concrete
implementation is ``FakeImgMatcher`` (ImageMatcher.cpp:6-24) which pairs
every image with every other. Here exhaustive pairing enumerates only
unordered pairs (i < j) — the reference matches (i, j) and then mirrors
(j, i) from the cache (SequentialReconstructor.cpp:219-227), so unordered
pairs carry the same information at half the work. A retrieval-based
matcher (the reference README's FAISS TODO) can slot in behind the same
interface later.
"""

from __future__ import annotations

import numpy as np


def exhaustive_pairs(num_images: int) -> np.ndarray:
    """All unordered pairs (i, j), i < j, as an (P, 2) int32 array."""
    idx = np.triu_indices(num_images, k=1)
    return np.stack(idx, axis=1).astype(np.int32)


def pairs_to_neighbors(pair_idx: np.ndarray, num_images: int):
    """Adjacency list {img: set(partners)} from a pair list."""
    adj = {i: set() for i in range(num_images)}
    for i, j in pair_idx:
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))
    return adj
