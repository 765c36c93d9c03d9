"""Vectorized numpy twins of the polynomial text-hash kernels (guide §4.2).

The contract's hash grammar (31/131-base polynomials mod 1e9+7 / 998244353,
GRAM_BASE shingle folds -- see :mod:`.textstats`) was previously evaluated
either as Catalyst higher-order functions (interpreted, not codegen'd) or
as per-character Python loops inside pandas UDFs. Both make the KERNEL the
bottleneck of every dedup/similarity operator. This module reproduces the
exact same integer arithmetic with numpy vector ops:

- all values are < 2^30 (the moduli), so products with the bases
  (31/131/1000003) stay < 2^50 and sums of per-char terms stay < 2^40 --
  everything fits uint64 exactly, no float rounding anywhere;
- token -> residue hashing is memoized in module-level dicts (natural
  language repeats tokens heavily; with ``spark.python.worker.reuse`` the
  memo also survives across tasks because this module is importable);
- per-document window/shingle folds are O(n) numpy slice arithmetic.

Every kernel's values are pinned bit-identical to the column/SQL
definitions by the DuckDB oracle contract and by unit tests.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

M1 = 1_000_000_007
B1 = 31
M2 = 998_244_353
B2 = 131
GRAM_BASE = 1_000_003

_TOK_SPLIT = re.compile(r"[^a-z0-9]+")

# token -> (h1, h2) residue memo; bounded so a pathological vocabulary
# cannot grow a worker's RSS forever (natural vocab is far below the cap)
_MEMO: dict[str, tuple[int, int]] = {}
_MEMO_CAP = 4_000_000


def _tok_residues(t: str) -> tuple[int, int]:
    v = _MEMO.get(t)
    if v is None:
        h1 = 0
        h2 = 0
        for ch in t:
            o = ord(ch)
            h1 = (h1 * B1 + o) % M1
            h2 = (h2 * B2 + o) % M2
        if len(_MEMO) >= _MEMO_CAP:
            _MEMO.clear()
        _MEMO[t] = v = (h1, h2)
    return v


def tokens(text: str | None) -> list[str]:
    """Exact Python twin of textstats.tokens_col (lower, split, drop '')."""
    if not text:
        return []
    return [t for t in _TOK_SPLIT.split(text.lower()) if t]


def tok_h1_array(toks: list[str]) -> np.ndarray:
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        out[i] = _tok_residues(t)[0]
    return out


def tok_h64_array(toks: list[str]) -> np.ndarray:
    """Combined 64-bit keys h1 * M2 + h2 per token (poly_hash64 twin)."""
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h1, h2 = _tok_residues(t)
        out[i] = h1 * M2 + h2
    return out


_CHUNK_MEMO: dict[str, int] = {}


def str_h64(s: str) -> int:
    """poly_hash64 of an arbitrary (ASCII) string, vectorized + memoized.

    h = sum(ord(c_i) * B^(L-1-i)) mod M for both polynomial families --
    each product is reduced mod M before the sum, so the uint64 partial
    sums stay < L * 2^30 (exact for any realistic L).
    """
    v = _CHUNK_MEMO.get(s)
    if v is not None:
        return v
    b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    L = len(b)
    if L == 0:
        h = 0
    else:
        p1 = _pow_table(B1, M1, L)[L - 1 :: -1]
        p2 = _pow_table(B2, M2, L)[L - 1 :: -1]
        h1 = int((b * p1 % M1).sum() % M1)
        h2 = int((b * p2 % M2).sum() % M2)
        h = h1 * M2 + h2
    if len(_CHUNK_MEMO) >= _MEMO_CAP:
        _CHUNK_MEMO.clear()
    _CHUNK_MEMO[s] = h
    return h


_POW: dict[tuple[int, int], np.ndarray] = {}


def _pow_table(base: int, mod: int, n: int) -> np.ndarray:
    key = (base, mod)
    cur = _POW.get(key)
    if cur is None or len(cur) < n:
        size = max(n, 1024)
        out = np.empty(size, dtype=np.uint64)
        out[0] = 1
        b = np.uint64(base)
        m = np.uint64(mod)
        for i in range(1, size):
            out[i] = out[i - 1] * b % m
        _POW[key] = cur = out
    return cur


def shingles_np(text: str | None, n: int) -> np.ndarray:
    """Sorted distinct n-gram shingle hashes (shingle_hashes twin)."""
    toks = tokens(text)
    L = len(toks)
    if L < n:
        return np.empty(0, dtype=np.int64)
    th = tok_h1_array(toks)
    nw = L - n + 1
    acc = th[:nw].copy()
    gb = np.uint64(GRAM_BASE)
    m1 = np.uint64(M1)
    for j in range(1, n):
        acc = (acc * gb + th[j : j + nw]) % m1
    return np.unique(acc).astype(np.int64)


def window_keys_np(text: str | None, w: int) -> np.ndarray:
    """All rolling w-token window keys (span_dedup's poly64 windows).

    Direct windowed fold of the per-token poly64 residues -- identical
    values to the incremental Rabin-Karp fold (modular identity), which
    is what the DuckDB oracle computes.
    """
    toks = tokens(text)
    L = len(toks)
    if L < w:
        return np.empty(0, dtype=np.int64)
    h64 = tok_h64_array(toks)
    m1 = np.uint64(M1)
    m2 = np.uint64(M2)
    a1 = h64 % m1
    a2 = h64 % m2
    nw = L - w + 1
    r1 = a1[:nw].copy()
    r2 = a2[:nw].copy()
    b1 = np.uint64(B1)
    b2 = np.uint64(B2)
    for j in range(1, w):
        r1 = (r1 * b1 + a1[j : j + nw]) % m1
        r2 = (r2 * b2 + a2[j : j + nw]) % m2
    return (r1 * m2 + r2).astype(np.int64)


def cdc_keys_np(text: str | None, avg: int) -> np.ndarray:
    """Content-defined chunk keys (cdc_chunks' per-doc chunk poly64s).

    A boundary falls AFTER any token whose h1 is 0 mod ``avg``; each
    chunk's key is poly64 of its tokens joined by \\x1f -- exactly the
    window+collect_list construction, computed per row.
    """
    toks = tokens(text)
    L = len(toks)
    if L == 0:
        return np.empty(0, dtype=np.int64)
    th = tok_h1_array(toks)
    cuts = np.flatnonzero(th % np.uint64(avg) == 0) + 1  # boundary AFTER token
    out = []
    start = 0
    for end in cuts:
        out.append(str_h64("\x1f".join(toks[start:end])))
        start = int(end)
    if start < L:
        out.append(str_h64("\x1f".join(toks[start:])))
    return np.asarray(out, dtype=np.int64)


# --------------------------------------------------------------- pandas UDFs


def shingle_kernel(n: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def kernel(texts: pd.Series) -> pd.Series:
        return pd.Series([shingles_np(t, n) for t in texts])

    return kernel


def span_keys_kernel(w: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def kernel(texts: pd.Series) -> pd.Series:
        return pd.Series([window_keys_np(t, w) for t in texts])

    return kernel


def cdc_keys_kernel(avg: int):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<long>")
    def kernel(texts: pd.Series) -> pd.Series:
        return pd.Series([cdc_keys_np(t, avg) for t in texts])

    return kernel


def lang_stats_kernel():
    """(lang_pred, n_tokens, stop_hits) per text -- exact twins of
    textstats.lang_id (argmax stopword hits, lexicographically-first
    language on ties, 'und' on zero) and the corpus-curation stop-hit
    count over the union stopword list (repeats counted). The Catalyst
    versions evaluate an interpreted filter+array_contains per token per
    language; this kernel counts per-token dict hits in one pass."""
    from pyspark.sql.functions import pandas_udf

    from .textstats import LANGS, STOPWORDS

    lang_of = {}
    for lg in LANGS:
        for w in STOPWORDS[lg]:
            lang_of.setdefault(w, []).append(lg)
    all_stop = {w for ws in STOPWORDS.values() for w in ws}

    @pandas_udf("struct<lang_pred: string, n_tokens: bigint, stop_hits: bigint>")
    def kernel(texts: pd.Series) -> pd.DataFrame:
        preds, ntoks, hits = [], [], []
        for t in texts:
            if t is None:
                # column twin: size/filter of a NULL token array are NULL
                # while lang_id(null) falls through to 'und'
                preds.append("und")
                ntoks.append(None)
                hits.append(None)
                continue
            toks = tokens(t)
            scores = dict.fromkeys(LANGS, 0)
            sh = 0
            for tok in toks:
                langs = lang_of.get(tok)
                if langs is not None:
                    for lg in langs:
                        scores[lg] += 1
                if tok in all_stop:
                    sh += 1
            best = max(scores.values())
            pred = "und"
            if best > 0:
                for lg in LANGS:  # first language wins ties
                    if scores[lg] == best:
                        pred = lg
                        break
            preds.append(pred)
            ntoks.append(len(toks))
            hits.append(sh)
        return pd.DataFrame({"lang_pred": preds, "n_tokens": pd.array(ntoks, dtype="Int64"), "stop_hits": pd.array(hits, dtype="Int64")})

    return kernel


def minhash_kernel(n: int, num_hashes: int, a: list[int], b: list[int], mod: int):
    """MinHash signature kernel: shingles (shingles_np) -> per-family
    affine re-hash minima, all uint64 vector ops (a*h < 2^37, +b < 2^38 --
    exact). Same values as array_min(transform(sh, (a*h+b) % mod));
    empty shingle sets yield nulls (callers filter)."""
    from pyspark.sql.functions import pandas_udf

    schema = ", ".join(f"mh_{i}: bigint" for i in range(num_hashes))
    aa = [np.uint64(x) for x in a[:num_hashes]]
    bb = [np.uint64(x) for x in b[:num_hashes]]
    m = np.uint64(mod)

    @pandas_udf(f"struct<{schema}>")
    def kernel(texts: pd.Series) -> pd.DataFrame:
        cols: list[list] = [[] for _ in range(num_hashes)]
        for t in texts:
            sh = shingles_np(t, n).astype(np.uint64)
            if len(sh) == 0:
                for c in cols:
                    c.append(None)
                continue
            for i in range(num_hashes):
                cols[i].append(int(((sh * aa[i] + bb[i]) % m).min()))
        return pd.DataFrame({f"mh_{i}": pd.array(cols[i], dtype="Int64") for i in range(num_hashes)})

    return kernel
