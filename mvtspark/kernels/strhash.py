"""Vectorized, SQL-reproducible string hashing for the dedup signature
pipeline (VERDICT r1 "What's wrong" #3: the per-shingle/per-token Python
``hashlib.md5`` loop was the 100-TB bottleneck of minhash/simhash).

Scheme: a base-1000003 polynomial fold over Unicode code points per
TOKEN, then a base-2654435761 fold over token hashes per SHINGLE, both
mod 2^64. Every constant is public (FNV-1a offset basis seed, CPython's
historical string-hash multiplier, Knuth's 32-bit multiplicative
constant). The polynomial form is exactly recomputable in DuckDB SQL —
``list_reduce(list_prepend(seed, list_transform(split(w,''), c ->
unicode(c))), (a,c) -> (a*1000003+c) % 2^64)`` — which keeps the LSH
pipeline oracle-checkable end-to-end, while the numpy side runs it as a
handful of whole-batch array ops (exponent gather + segmented sums)
instead of one C-library call per string.

Why not vectorized MD5: a numpy RFC-1321 implementation was built and
benchmarked — the 64 rounds run at 1.6M lanes/s, but padding/scatter
overhead per lane left it at parity with the hashlib loop, nowhere near
the required 5x (see BENCH.md).

No reference analog (the reference has no hashing surface).
"""

from __future__ import annotations

import numpy as np

U64 = 1 << 64
TOKEN_SEED = 14695981039346656037  # FNV-1a 64-bit offset basis
TOKEN_MULT = 1000003               # CPython legacy string-hash multiplier
SHINGLE_SEED = 1099511628211       # FNV-1a 64-bit prime
SHINGLE_MULT = 2654435761          # Knuth multiplicative (2^32 * phi)

_TM = np.uint64(TOKEN_MULT)
_SM = np.uint64(SHINGLE_MULT)


def token_hash_scalar(w: str) -> int:
    """Reference scalar form (tests + documentation of the contract)."""
    h = TOKEN_SEED
    for c in w:
        h = (h * TOKEN_MULT + ord(c)) % U64
    return h


def _pow_table(base: np.uint64, n: int) -> np.ndarray:
    with np.errstate(over="ignore"):  # uint64 wrap IS the mod-2^64 math
        p = np.empty(n + 1, dtype=np.uint64)
        p[0] = 1
        for j in range(1, n + 1):
            p[j] = p[j - 1] * base
        return p


# code points str.split() treats as whitespace (== str.isspace(), the
# Unicode WSpace + bidi classes), as a lookup table for vectorized
# tokenization; code points above the table max are never whitespace
_WS_CODEPOINTS = (
    list(range(0x09, 0x0E)) + list(range(0x1C, 0x21)) + [0x85, 0xA0, 0x1680]
    + list(range(0x2000, 0x200B)) + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
)
_WS_TABLE = np.zeros(0x3002, dtype=bool)
_WS_TABLE[_WS_CODEPOINTS] = True
# slot 0x3001 is a sentinel: every code point above the table range maps
# onto it via np.minimum and is never whitespace


def token_hashes_batch(texts) -> tuple[np.ndarray, np.ndarray]:
    """Whitespace-tokenize with exact ``str.lower().split()`` semantics
    and hash every token of the batch in ONE vectorized pass → (flat
    uint64 token hashes, per-doc token counts). The only per-doc Python
    is ``lower()``; splitting is a whitespace-class table lookup over the
    utf-32 code points and doc assignment is a searchsorted on the doc
    boundaries."""
    ndocs = len(texts)
    counts = np.zeros(ndocs, dtype=np.int64)
    lowered = [(t or "").lower() for t in texts]
    if ndocs == 0:
        return np.empty(0, dtype=np.uint64), counts
    # '\n' doc separator is itself whitespace, so it can never glue two
    # docs' tokens together; doc index recovered from char offsets
    cps = np.frombuffer("\n".join(lowered).encode("utf-32-le"), dtype="<u4")
    if cps.size == 0:
        return np.empty(0, dtype=np.uint64), counts
    doc_char_end = np.cumsum(
        np.fromiter((len(t) + 1 for t in lowered), dtype=np.int64, count=ndocs)
    )
    sep = _WS_TABLE[np.minimum(cps, np.uint32(0x3001))]
    keep = ~sep
    prev_sep = np.empty_like(sep)
    prev_sep[0] = True
    prev_sep[1:] = sep[:-1]
    next_sep = np.empty_like(sep)
    next_sep[-1] = True
    next_sep[:-1] = sep[1:]
    starts = np.flatnonzero(keep & prev_sep)
    lens = np.flatnonzero(keep & next_sep) + 1 - starts
    cps_tok = cps[keep]
    ntok = lens.size
    if ntok:
        doc_idx = np.searchsorted(doc_char_end, starts, side="right")
        counts = np.bincount(doc_idx, minlength=ndocs).astype(np.int64)
    if ntok == 0:
        return np.empty(0, dtype=np.uint64), counts
    cbounds = np.zeros(ntok, dtype=np.int64)
    np.cumsum(lens[:-1], out=cbounds[1:])
    # Horner fold, one masked round per char position: h = h*B + cp.
    # (An exponent-table formulation needs two ntok->nchars np.repeats
    # plus an arange — 3x slower and 5x the peak memory.)
    tok_h = np.full(ntok, np.uint64(TOKEN_SEED), dtype=np.uint64)
    active = np.arange(ntok, dtype=np.int64)
    for j in range(int(lens.max())):
        if j:
            active = active[lens[active] > j]
        tok_h[active] = tok_h[active] * _TM + cps_tok[cbounds[active] + j]
    return tok_h, counts


def shingle_hashes_batch(
    tok_h: np.ndarray, counts: np.ndarray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc n-token shingle hashes → (flat uint64, per-doc shingle
    counts). Docs with fewer than ``n`` tokens yield ONE shingle folding
    all their tokens; an empty doc folds one virtual empty token
    (hash TOKEN_SEED) — mirroring DuckDB where splitting '' yields ['']."""
    ndocs = counts.size
    ntok = tok_h.size
    sh_counts = np.where(counts < n, 1, counts - n + 1)
    sh_bounds = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(sh_counts, out=sh_bounds[1:])
    out = np.empty(int(sh_bounds[-1]), dtype=np.uint64)
    tok_bounds = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=tok_bounds[1:])
    powC = _pow_table(_SM, n)

    # full windows (docs with >= n tokens), vectorized over ALL windows
    if ntok >= n:
        nwin = ntok - n + 1
        # seed terms via Python-int pow: numpy SCALAR uint64 ops emit
        # overflow warnings (array ops wrap silently)
        sh_win = np.full(
            nwin,
            np.uint64(SHINGLE_SEED * pow(SHINGLE_MULT, n, U64) % U64),
            dtype=np.uint64,
        )
        for j in range(n):
            sh_win += tok_h[j : nwin + j] * powC[n - 1 - j]
        tok_doc = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        valid = tok_doc[:nwin] == tok_doc[n - 1 :]
        big = counts >= n
        if big.any():
            nb = sh_counts[big]
            off = np.zeros(int(big.sum()), dtype=np.int64)
            np.cumsum(nb[:-1], out=off[1:])
            w = np.arange(int(nb.sum()), dtype=np.int64) - np.repeat(off, nb)
            dst = np.repeat(sh_bounds[:-1][big], nb) + w
            out[dst] = sh_win[valid]
    # short docs (k < n tokens): one fold over their k tokens, grouped by k
    small = counts < n
    if small.any():
        for k in np.unique(counts[small]):
            docs_k = np.flatnonzero(counts == int(k))
            if k == 0:
                # virtual empty token (hash TOKEN_SEED) for tokenless docs
                out[sh_bounds[:-1][docs_k]] = np.uint64(
                    (SHINGLE_SEED * SHINGLE_MULT + TOKEN_SEED) % U64
                )
            else:
                acc = np.full(
                    docs_k.size,
                    np.uint64(SHINGLE_SEED * pow(SHINGLE_MULT, int(k), U64) % U64),
                    dtype=np.uint64,
                )
                st = tok_bounds[:-1][docs_k]
                for j in range(int(k)):
                    acc += tok_h[st + j] * powC[k - 1 - j]
                out[sh_bounds[:-1][docs_k]] = acc
    return out, sh_counts


def simhash_batch(tok_h: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """64-bit Charikar simhash per doc from flat token hashes.

    Shape: 64 per-bit passes of 1-D ops (shift/mask, cumsum, two
    boundary gathers). A single (ntok, 64) vote matrix looks more
    "vectorized" but allocates tens of MB and benched 5-100x slower than
    these cache-resident 1-D sweeps; likewise 2-D ufunc.reduceat.

    A tokenless doc gets one virtual empty token (hash TOKEN_SEED), so a
    single-token fold makes its simhash exactly TOKEN_SEED — matching
    the DuckDB oracle where splitting '' yields ['']."""
    ndocs = counts.size
    sim = np.zeros(ndocs, dtype=np.uint64)
    bounds = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    nz = counts > 0
    if tok_h.size and nz.any():
        one = np.uint64(1)
        shifted = np.empty(tok_h.size, dtype=np.uint64)
        starts_nz = bounds[:-1][nz]  # strictly < ntok, strictly increasing
        counts_nz = counts[nz].astype(np.uint64)
        sim_nz = np.zeros(int(nz.sum()), dtype=np.uint64)
        for b in range(64):
            np.right_shift(tok_h, np.uint64(b), out=shifted)
            shifted &= one
            seg = np.add.reduceat(shifted, starts_nz)
            # majority positive vote: (+1 votes) > count/2
            sim_nz |= (2 * seg > counts_nz).astype(np.uint64) << np.uint64(b)
        sim[nz] = sim_nz
    sim[~nz] = np.uint64(TOKEN_SEED)
    return sim
