"""Language identification kernel.

Semantics-equal reimplementation of language_detector.py (SURVEY.md §2.3
C5): unicode-script histogram over 13 ranges → script; non-Latin script →
direct language map; CJK sub-rule via kana/hangul counts; Latin script →
common-word overlap over 10 languages with confidence = min(1,
matches/|vocab(text)|·5). Round-4 confidences.
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Any

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


def _detect_script(text: str) -> tuple[str, float]:
    counts: Counter[str] = Counter()
    letters = 0
    for ch in text:
        if not ch.isalpha():
            continue
        letters += 1
        code = ord(ch)
        for script, (lo, hi) in _SCRIPT_RANGES.items():
            if lo <= code <= hi:
                counts[script] += 1
                break
    if not counts or letters == 0:
        return "unknown", 0.0
    script, n = counts.most_common(1)[0]
    return script, n / letters


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
    hira = sum(1 for c in text if 0x3040 <= ord(c) <= 0x309F)
    kata = sum(1 for c in text if 0x30A0 <= ord(c) <= 0x30FF)
    hang = sum(1 for c in text if 0xAC00 <= ord(c) <= 0xD7AF)
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
