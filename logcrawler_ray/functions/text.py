"""Text-analysis kernels for the documents table: tokenizing, quality
scoring, language-ID heuristic, fingerprinting, shingling.

These are the training-data-pipeline operators the brief adds beyond the
reference's own inventory (the reference's only text ops are path/name
parsing, SURVEY.md §2.7); each is deterministic and batch-oriented.
"""

from __future__ import annotations

import re

import numpy as np

from .hashing import hash64_str, splitmix64

# Single-space split, to stay bit-compatible with DuckDB's
# string_split(text, ' ') for the SQL oracle (empty tokens preserved).
def split_tokens(text: str) -> list[str]:
    return text.split(" ")


_WORD_RE = re.compile(r"[\w']+", re.UNICODE)


def words(text: str) -> list[str]:
    return _WORD_RE.findall(text.lower())


STOPWORDS = {
    "en": {"the", "a", "of", "to", "and", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit", "von"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "du", "pour"},
    "es": {"el", "la", "los", "las", "es", "un", "una", "de", "y", "para"},
    "zh": set(),  # ideographic; detected by character class instead
}
_ALL_STOP = set().union(*STOPWORDS.values())


def quality_score(text: str) -> dict:
    """Length / punctuation / stopword / word-shape heuristics -> [0, 1]."""
    n = len(text)
    toks = words(text)
    n_words = len(toks)
    alpha = sum(ch.isalpha() for ch in text)
    punct = sum(not ch.isalnum() and not ch.isspace() for ch in text)
    mean_wl = (sum(len(t) for t in toks) / n_words) if n_words else 0.0
    stop_ratio = (sum(t in _ALL_STOP for t in toks) / n_words) if n_words else 0.0
    len_score = min(1.0, n / 200.0) * (1.0 if n < 20000 else 0.5)
    punct_ratio = punct / n if n else 1.0
    score = (
        0.35 * len_score
        + 0.25 * min(1.0, stop_ratio * 4)
        + 0.25 * (1.0 - min(1.0, punct_ratio * 5))
        + 0.15 * (1.0 if 3.0 <= mean_wl <= 10.0 else 0.3)
    )
    return {
        "n_chars": n,
        "n_words": n_words,
        "alpha_ratio": alpha / n if n else 0.0,
        "punct_ratio": punct_ratio,
        "stop_ratio": stop_ratio,
        "mean_word_len": mean_wl,
        "quality": round(score, 6),
    }


def lang_id(text: str) -> str:
    """Cheap n-gram/stopword language heuristic over {en,de,fr,es,zh}."""
    if any("一" <= ch <= "鿿" for ch in text):
        return "zh"
    toks = set(words(text))
    best, best_score = "en", -1.0
    for lang, stops in STOPWORDS.items():
        if not stops:
            continue
        score = len(toks & stops)
        if score > best_score:
            best, best_score = lang, score
    return best


def fingerprint(text: str, base: int = 1_000_003) -> int:
    """Rolling polynomial (Karp-Rabin) hash of the whole document -> uint64."""
    h = np.uint64(0)
    b = np.uint64(base)
    with np.errstate(over="ignore"):
        for ch in text.encode("utf-8"):
            h = h * b + np.uint64(ch)
    return int(splitmix64(int(h)))


def word_ngrams(text: str, n: int = 3) -> list[str]:
    """Word n-grams; docs with fewer than ``n`` tokens have NONE — the
    same semantics as the SQL oracles' n-way token self-join (q21/q53
    build grams as t0 JOIN t1 ON i+1 JOIN t2 ON i+2: a 1-2-token doc gets
    no gram rows). The old whole-text fallback silently diverged from
    every oracle on short docs (review finding)."""
    toks = words(text)
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def shingle_hashes(text: str, n: int = 3,
                   hasher: str = "blake2b") -> np.ndarray:
    """Distinct word n-gram shingles -> uint64 hashes (for minhash/jaccard).

    ``hasher="md5sql"`` switches to :func:`..hashing.md5_hash64` — bit-
    identical to DuckDB's ``md5_number_upper``, which lets a SQL oracle
    replay the hashes exactly (q21)."""
    grams = set(word_ngrams(text, n))
    if not grams:
        return np.zeros(0, dtype=np.uint64)
    if hasher == "md5sql":
        from .hashing import md5_hash64_array

        return md5_hash64_array(list(grams))
    from .hashing import hash64_str_array

    return hash64_str_array(list(grams))


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if len(a) == 0 and len(b) == 0:
        return 1.0
    sa, sb = set(a.tolist()), set(b.tolist())
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter) if (sa or sb) else 1.0
