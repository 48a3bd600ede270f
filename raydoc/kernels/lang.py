"""Language identification kernel.

Semantics-equal reimplementation of language_detector.py (SURVEY.md §2.3
C5): unicode-script histogram over 13 ranges → script; non-Latin script →
direct language map; CJK sub-rule via kana/hangul counts; Latin script →
common-word overlap over 10 languages with confidence = min(1,
matches/|vocab(text)|·5). Round-4 confidences.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np

_SCRIPT_RANGES = {
    "latin": (0x0000, 0x024F),
    "cyrillic": (0x0400, 0x04FF),
    "arabic": (0x0600, 0x06FF),
    "devanagari": (0x0900, 0x097F),
    "bengali": (0x0980, 0x09FF),
    "myanmar": (0x1000, 0x109F),
    "thai": (0x0E00, 0x0E7F),
    "cjk": (0x4E00, 0x9FFF),
    "hangul": (0xAC00, 0xD7AF),
    "hiragana": (0x3040, 0x309F),
    "katakana": (0x30A0, 0x30FF),
    "greek": (0x0370, 0x03FF),
    "hebrew": (0x0590, 0x05FF),
}

_COMMON_WORDS = {
    "en": {"the", "and", "is", "in", "to", "of", "a", "for", "that", "it", "with", "as", "was", "be"},
    "de": {"der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich", "des", "auf", "für"},
    "fr": {"le", "la", "les", "de", "un", "une", "et", "est", "en", "que", "des", "du", "qui", "dans"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "se", "los", "las", "con", "por"},
    "it": {"il", "la", "di", "che", "e", "un", "una", "in", "è", "per", "non", "con", "del", "si"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "uma", "para", "é", "com", "não"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "op", "te", "dat", "die", "voor", "met"},
    "id": {"yang", "dan", "di", "untuk", "dengan", "dari", "ini", "itu", "ke", "dalam", "adalah"},
    "tr": {"bir", "ve", "bu", "için", "ile", "de", "da", "olarak", "olan", "var", "kadar", "gibi"},
    "vi": {"và", "của", "là", "có", "trong", "được", "cho", "với", "này", "các", "những", "đã"},
}

_SCRIPT_TO_LANG = {
    "cyrillic": "ru", "arabic": "ar", "devanagari": "hi", "bengali": "bn",
    "myanmar": "my", "thai": "th", "hangul": "ko", "hebrew": "he",
    "greek": "el",
}

_LATIN_WORD = re.compile(r"\b[a-zA-Z]+\b")

DEFAULT_LANGUAGE = "en"

# Vectorized script histogram: sorted half-open boundary array for
# np.searchsorted; odd bin index i*2+1 ↔ script i (ranges don't overlap).
_SCRIPTS = sorted(_SCRIPT_RANGES, key=lambda s: _SCRIPT_RANGES[s][0])
_BOUNDS = np.empty(2 * len(_SCRIPTS), dtype=np.uint32)
for _i, _s in enumerate(_SCRIPTS):
    _lo, _hi = _SCRIPT_RANGES[_s]
    _BOUNDS[2 * _i] = _lo
    _BOUNDS[2 * _i + 1] = _hi + 1  # half-open upper edge

_ASCII_ALPHA = np.zeros(256, dtype=bool)
for _c in range(256):
    _ASCII_ALPHA[_c] = chr(_c).isalpha()


def _codepoints(text: str) -> "np.ndarray":
    return np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)


def _alpha_mask(codes: "np.ndarray") -> "np.ndarray":
    """Exact ``str.isalpha`` mask: table lookup below U+0100, per-unique
    Python isalpha above (few uniques even in CJK text)."""
    mask = np.zeros(codes.shape, dtype=bool)
    low = codes < 256
    mask[low] = _ASCII_ALPHA[codes[low]]
    high = ~low
    if high.any():
        hi_codes = codes[high]
        uniq = np.unique(hi_codes)
        alpha_uniq = np.fromiter((chr(int(u)).isalpha() for u in uniq),
                                 dtype=bool, count=len(uniq))
        mask[high] = alpha_uniq[np.searchsorted(uniq, hi_codes)]
    return mask


def _detect_script(text: str) -> tuple[str, float]:
    codes = _codepoints(text)
    alpha = codes[_alpha_mask(codes)]
    letters = len(alpha)
    if letters == 0:
        return "unknown", 0.0
    bins = np.searchsorted(_BOUNDS, alpha, side="right")
    in_range = (bins & 1).astype(bool)
    if not in_range.any():
        return "unknown", 0.0
    script_ids = bins[in_range] >> 1
    counts = np.bincount(script_ids, minlength=len(_SCRIPTS))
    best = int(counts.argmax())
    return _SCRIPTS[best], int(counts[best]) / letters


def _detect_latin(text: str) -> tuple[str, float]:
    words = _LATIN_WORD.findall(text.lower())
    if not words:
        return DEFAULT_LANGUAGE, 0.0
    vocab = set(words)
    scores = {lang: len(vocab & bank) for lang, bank in _COMMON_WORDS.items()}
    if not scores or max(scores.values()) == 0:
        return DEFAULT_LANGUAGE, 0.0
    best = max(scores, key=scores.get)
    conf = scores[best] / len(vocab) if vocab else 0
    return best, min(1.0, conf * 5)


def _detect_cjk(text: str) -> str:
    codes = _codepoints(text)
    hira = int(((codes >= 0x3040) & (codes <= 0x309F)).sum())
    kata = int(((codes >= 0x30A0) & (codes <= 0x30FF)).sum())
    hang = int(((codes >= 0xAC00) & (codes <= 0xD7AF)).sum())
    if hira + kata > 5:
        return "ja"
    if hang > 5:
        return "ko"
    return "zh"


def detect_language(text: str) -> dict[str, Any]:
    """→ {language, confidence, script, method} (language_detector.py:73-109)."""
    if not text or len(text.strip()) < 10:
        return {"language": DEFAULT_LANGUAGE, "confidence": 0.0,
                "script": "unknown", "method": "insufficient_text"}
    script, script_conf = _detect_script(text)
    if script != "latin" and script in _SCRIPT_TO_LANG:
        return {"language": _SCRIPT_TO_LANG[script],
                "confidence": round(script_conf, 4), "script": script,
                "method": "script"}
    if script == "cjk":
        return {"language": _detect_cjk(text),
                "confidence": round(script_conf, 4), "script": "cjk",
                "method": "cjk_analysis"}
    if script == "latin":
        lang, conf = _detect_latin(text)
        return {"language": lang, "confidence": round(conf, 4),
                "script": "latin", "method": "word_frequency"}
    return {"language": DEFAULT_LANGUAGE, "confidence": 0.0, "script": script,
            "method": "fallback"}


def detect_language_of_turns(turn_texts: list[str]) -> dict[str, Any]:
    """First-5-turns sample, space-joined (language_detector.py:179-193)."""
    if not turn_texts:
        return {"language": DEFAULT_LANGUAGE, "confidence": 0.0,
                "script": "unknown", "method": "no_pages"}
    return detect_language(" ".join(turn_texts[:5]))
