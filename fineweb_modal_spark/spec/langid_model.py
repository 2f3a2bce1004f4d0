"""fastText-style language-ID: hashed n-gram linear model, hermetic.

The north rule calls for fastText langid as a vectorized pandas/Arrow
UDF stage. fastText itself is unavailable offline, so this is a
self-contained model of the same *shape*: text → bag of hashed
features (lowercased words + character trigrams) → linear scores per
language → argmax + softmax confidence. Weights are derived
deterministically from built-in per-language lexicons (no external
data), so the model is a pure function of this file.

Both the Spark operator (operators/langid.py, inside mapInPandas) and
the pytest oracle call `predict_batch` / `predict_one` here — the two
sides cannot diverge.

Reference analog: the per-container model-load-once + batched encode
pattern of /root/reference/features.py:92-101,135-145.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np

LANGS = ["en", "fr", "de", "es", "zh", "und"]
N_BUCKETS = 1 << 16  # 65536 hashed feature buckets
_UND = LANGS.index("und")

# Distinctive high-frequency words per language (public-knowledge
# stopword lists, truncated). Weight = 1.0 per word feature.
LEXICONS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was",
           "for", "with", "are", "this", "not", "have", "you", "they"],
    "fr": ["le", "la", "les", "des", "est", "dans", "une", "pour",
           "que", "qui", "sur", "avec", "pas", "nous", "vous", "mais"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine",
           "mit", "auf", "sich", "auch", "sind", "wird", "dem", "den"],
    "es": ["el", "los", "las", "es", "una", "por", "con", "para",
           "del", "se", "su", "al", "como", "pero", "sus", "este"],
    # zh is recognized via the CJK character-class feature below.
    "zh": [],
}

# character trigrams distinctive per language (accented letters and
# frequent digraph contexts), same unit weight.
CHAR_LEXICONS: dict[str, list[str]] = {
    "en": ["th", "ing", "ion"],
    "fr": ["é", "è", "ç", "à", "eau", "oux", "ais"],
    "de": ["ä", "ö", "ü", "ß", "sch", "ich", "ein"],
    "es": ["ñ", "ó", "í", "ción", "á", "ado"],
    "zh": [],
}

_CJK_FEATURE = "<cjk>"


def _bucket(token: str) -> int:
    """Deterministic token → bucket (crc32: stable across processes,
    C-speed, no PYTHONHASHSEED dependence)."""
    return crc32(token.encode("utf-8")) % N_BUCKETS


def _char_ngrams(word: str, n_lo: int = 2, n_hi: int = 3) -> list[str]:
    w = f"<{word}>"
    out = []
    for n in range(n_lo, n_hi + 1):
        out.extend(w[i : i + n] for i in range(len(w) - n + 1))
    return out


def build_weights() -> np.ndarray:
    """(N_BUCKETS, n_langs) float32 weight matrix from the lexicons.

    Word features carry the bulk of the signal (weight 3.0); character
    n-grams are weighted ONLY for the accent/digraph lexicon (1.5) —
    deriving char weights from lexicon words spills onto unrelated
    English words ('order' contains 'der') and measurably hurts
    accuracy, so word-derived char n-grams get zero weight. The char
    features still exist in `features_of` (fastText shape) so a richer
    weight table can use them without changing the extractor.
    """
    W = np.zeros((N_BUCKETS, len(LANGS)), dtype=np.float32)
    for li, lang in enumerate(LANGS[:-1]):
        for word in LEXICONS[lang]:
            W[_bucket("w:" + word), li] += 3.0
        for g in CHAR_LEXICONS[lang]:
            W[_bucket("c:" + g), li] += 1.5
    W[_bucket(_CJK_FEATURE), LANGS.index("zh")] += 5.0
    return W


def _is_cjk(ch: str) -> bool:
    o = ord(ch)
    return 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF


def features_of(text: str) -> list[int]:
    """Hashed feature buckets of one document (words + char n-grams)."""
    feats: list[int] = []
    cjk = 0
    for word in text.lower().split():
        feats.append(_bucket("w:" + word))
        for g in _char_ngrams(word):
            feats.append(_bucket("c:" + g))
        cjk += sum(1 for ch in word if _is_cjk(ch))
    # one CJK feature per CJK char: frequency matters for short texts
    feats.extend([_bucket(_CJK_FEATURE)] * cjk)
    return feats


def predict_batch(texts: list[str], W: np.ndarray | None = None) -> tuple[list[str], np.ndarray]:
    """Vectorized scoring of a batch → (lang_pred list, confidence f32).

    Scores are L1-normalized by feature count; argmax with an
    'und' floor: fewer than 3 features or a zero best score → 'und'.
    Confidence = softmax over language scores (float32 discipline per
    SURVEY.md §7.4 risk 2).
    """
    if W is None:
        W = _WEIGHTS
    n = len(texts)
    preds = ["und"] * n
    confs = np.zeros(n, dtype=np.float32)
    for i, text in enumerate(texts):
        feats = features_of(text if text is not None else "")
        if len(feats) < 3:
            confs[i] = np.float32(1.0)
            continue
        scores = W[np.asarray(feats, dtype=np.int64)].sum(axis=0)
        scores = scores / np.float32(len(feats))
        best = int(scores.argmax())
        if scores[best] <= 0.0:
            best = _UND
        e = np.exp(scores - scores.max(), dtype=np.float32)
        confs[i] = np.float32(e[best] / e.sum())
        preds[i] = LANGS[best]
    return preds, confs


def predict_one(text: str) -> tuple[str, float]:
    p, c = predict_batch([text])
    return p[0], float(c[0])


_WEIGHTS = build_weights()
