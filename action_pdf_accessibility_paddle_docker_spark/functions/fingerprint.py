"""Rolling-hash document fingerprinting (winnowing).

Schleimer/Wilkerson/Aiken winnowing: k-gram Rabin-Karp rolling hashes over
the normalized character stream, then the minimum hash in each sliding
window of w consecutive hashes (rightmost minimum on ties). The selected
fingerprints are position-independent document signatures robust to small
edits -- the classic near-dup / plagiarism primitive.

Pure-python reference implementation plus a numpy-vectorized one (used in
the Spark mapInPandas operator); tests assert equality. Not ANSI-SQL
expressible, so the driver check for the query entry is rows-only.
"""

from __future__ import annotations

import re

import numpy as np

_B = 131  # polynomial base
_M = (1 << 61) - 1  # Mersenne prime modulus
_WS = re.compile(r"\s+")


def _normalize(text: str) -> str:
    return _WS.sub(" ", text.strip()).lower()


def kgram_hashes(text: str, k: int = 8) -> list[int]:
    """Rolling polynomial hashes of all k-grams (scalar reference impl)."""
    s = _normalize(text)
    n = len(s)
    if n < k:
        return []
    h = 0
    for ch in s[:k]:
        h = (h * _B + ord(ch)) % _M
    out = [h]
    top = pow(_B, k - 1, _M)
    for i in range(k, n):
        h = ((h - ord(s[i - k]) * top) * _B + ord(s[i])) % _M
        out.append(h)
    return out


def winnow(hashes: list[int], w: int = 5) -> list[tuple[int, int]]:
    """(position, hash) fingerprints: minimum of each window, rightmost min
    on ties, deduplicated on consecutive repeats (scalar reference impl)."""
    if not hashes:
        return []
    if len(hashes) <= w:
        m = min(range(len(hashes)), key=lambda i: (hashes[i], -i))
        return [(m, hashes[m])]
    out: list[tuple[int, int]] = []
    last = None
    for start in range(len(hashes) - w + 1):
        window = hashes[start:start + w]
        best = None
        for j in range(w - 1, -1, -1):  # rightmost minimum
            if best is None or window[j] < window[best]:
                best = j
        pick = (start + best, window[best])
        if pick != last:
            out.append(pick)
            last = pick
    return out


def fingerprints(text: str, k: int = 8, w: int = 5) -> list[int]:
    return [h for _, h in winnow(kgram_hashes(text, k), w)]


# --- numpy-vectorized twin (the Spark-side kernel) -------------------------

def kgram_hashes_np(text: str, k: int = 8) -> np.ndarray:
    s = _normalize(text)
    n = len(s)
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(object)
    # object dtype -> python ints: exact modular arithmetic, vector-shaped
    powers = [pow(_B, k - 1 - j, _M) for j in range(k)]
    h = np.zeros(n - k + 1, dtype=object)
    for j in range(k):
        h = (h + codes[j:j + n - k + 1] * powers[j]) % _M
    return h.astype(np.uint64)


def fingerprints_np(text: str, k: int = 8, w: int = 5) -> list[int]:
    hs = kgram_hashes_np(text, k)
    m = len(hs)
    if m == 0:
        return []
    if m <= w:
        i = int(np.lexsort((-np.arange(m), hs.astype(np.int64)))[0])
        return [int(hs[i])]
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(hs, w)
    rev = win[:, ::-1]
    arg_rev = rev.argmin(axis=1)  # first min in reversed = rightmost min
    arg = w - 1 - arg_rev
    pos = np.arange(len(win)) + arg
    val = win[np.arange(len(win)), arg]
    keep = np.ones(len(win), dtype=bool)
    keep[1:] = (pos[1:] != pos[:-1]) | (val[1:] != val[:-1])
    return [int(v) for v in val[keep]]
