"""Deterministic hashed char-n-gram text embedding (hermetic).

Stand-in for the reference's GPU TEI embedding stage
(/root/reference/embed-tei.py:167-176: batch of texts → (n, 768)
float array; experimental/embed.py:114-144 local-model variant).
No torch/transformers offline, so the model is a feature-hashing
projection of the same *shape*: char trigrams → signed buckets →
L2-normalized float32 vector. Pure function of this file; both the
Spark operator (operators/embed.py) and the pytest oracle call
`embed_batch`, so the two sides cannot diverge (the reference's own
validation strategy — independent re-embed + dot-product compare,
validate.ipynb cells 41-50).
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

DIM = 64


def _grams(text: str, n: int = 3) -> list[str]:
    t = f" {text.lower().strip()} "
    if len(t) < n:
        return [t]
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def embed_one(text: str) -> np.ndarray:
    v = np.zeros(DIM, dtype=np.float32)
    for g in _grams(text if text else ""):
        h = crc32(g.encode("utf-8"))
        j = h % DIM
        sign = 1.0 if (h >> 7) & 1 else -1.0
        v[j] += np.float32(sign)
    n = np.float32(np.sqrt(np.float32((v * v).sum())))
    if n > 0:
        v = (v / n).astype(np.float32)
    return v


def embed_batch(texts: list[str]) -> np.ndarray:
    """(len(texts), DIM) float32, rows L2-normalized (or zero)."""
    out = np.zeros((len(texts), DIM), dtype=np.float32)
    for i, t in enumerate(texts):
        out[i] = embed_one(t)
    return out
