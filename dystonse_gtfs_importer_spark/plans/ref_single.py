"""Single-process reference recomputations for the iterative registry
entries (``bpe_token_histogram``, ``kmeans_clusters``).

Both operators are iterative, so no DuckDB SQL can express them — but
both are SEEDED and DETERMINISTIC (argmax tie-breaks, integer-hash
sampling, lowest-cell argmin ties), so their expected output over a
fixed fixture is a stable literal table.  These functions recompute
that output OUTSIDE Spark (pyarrow + pure Python / NumPy — none of
the distributed plumbing), following the ``curve_stack_stats``
literal-VALUES oracle pattern from round 3: the driver then
hash-checks the distributed pipeline (shuffles, Arrow transfer,
broadcast argmin, lineage truncation) against this local derivation.

The only cross-derivation sensitivity is float summation order
(documented in operators/clustering.py); every emitted float is
quantized (1e-6 fingerprints) far above double accumulation error at
fixture scale, and ``tests/test_ref_single.py`` pins equality against
the live Spark implementations.
"""

from __future__ import annotations

import re
from collections import Counter

# --------------------------------------------------------------------
# Spark-compatible XXH64 scalar hashing (Catalyst's XxHash64 for a
# single LONG / INT column, seed-chained like ``xxhash64(col, lit)``).
# Needed to reproduce operators/clustering.py::_hash01 exactly.
# --------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 8-byte long (Spark XXH64.hashLong)."""
    h = (seed + _P5 + 8) & _M64
    h ^= _rotl((value & _M64) * _P2 & _M64, 31) * _P1 & _M64
    return _fmix((_rotl(h, 27) * _P1 + _P4) & _M64)


def xxh64_int(value: int, seed: int) -> int:
    """XXH64 of one 4-byte int (Spark XXH64.hashInt)."""
    h = (seed + _P5 + 4) & _M64
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M64
    return _fmix((_rotl(h, 23) * _P2 + _P3) & _M64)


def hash01(pid: int, salt: int) -> float:
    """Twin of operators/clustering.py::_hash01 —
    ``pmod(xxhash64(pid_bigint, lit_int(salt)), 2^40) / 2^40``.
    Spark chains column hashes (seed 42 → hashLong(pid) →
    hashInt(salt)); pmod by 2^40 is the low 40 bits either way the
    64-bit result is signed."""
    h = xxh64_int(salt, xxh64_long(pid, 42))
    return (h & ((1 << 40) - 1)) / float(1 << 40)


# --------------------------------------------------------------------
# BPE: textbook single-process Sennrich alg. 1 with the same
# tokenization and tie-break as operators/bpe.py.
# --------------------------------------------------------------------

_END = "</w>"


def _word_counts(texts) -> Counter:
    """Twin of operators/bpe.py::word_counts: lowercase, split on runs
    of literal spaces, drop empties."""
    wc: Counter = Counter()
    for t in texts:
        if t is None:
            continue
        for w in re.split(" +", t.lower()):
            if w:
                wc[w] += 1
    return wc


def _merge_seq(seq: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(seq):
        if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def ref_bpe_token_histogram(sf_dir: str,
                            n_merges: int = 10) -> list[tuple[str, int]]:
    """Expected (token, cnt) rows of the ``bpe_token_histogram``
    registry query: train ``n_merges`` BPE merges on the documents
    word counts (tie-break count DESC, pair ASC — operators/bpe.py),
    encode the vocabulary, and aggregate counts per BPE token."""
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet",
                          columns=["text"]).column("text").to_pylist()
    wc = _word_counts(texts)
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in wc.items():
        key = tuple(list(w) + [_END])
        vocab[key] = vocab.get(key, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for seq, c in vocab.items():
            for i in range(len(seq) - 1):
                pairs[(seq[i], seq[i + 1])] += c
        if not pairs:
            break
        (a, b), _ = min(pairs.items(),
                        key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((a, b))
        new_vocab: dict[tuple[str, ...], int] = {}
        for seq, c in vocab.items():
            key = tuple(_merge_seq(list(seq), a, b))
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    # encode each ORIGINAL word with the merge list in training order
    # (bpe_token_counts re-encodes from scratch, it does not reuse the
    # training vocab state)
    tc: Counter = Counter()
    for w, c in wc.items():
        seq = list(w) + [_END]
        for a, b in merges:
            seq = _merge_seq(seq, a, b)
        for tok in seq:
            tc[tok] += c
    return sorted(tc.items())


# --------------------------------------------------------------------
# k-means: NumPy twin of operators/clustering.py::kmeans with
# k-means|| init (hash01 sampling, exact candidate dedup, greedy
# weighted k-means++ reduction) and the Lloyd loop to convergence.
# --------------------------------------------------------------------


def _assign(x, vn2, cents):
    """L2 argmin with the lowest-cell tie-break (np.argmin picks the
    first minimum, matching array_min over struct(d2, cell))."""
    import numpy as np

    d2 = vn2[:, None] - 2.0 * (x @ cents.T) + (cents * cents).sum(axis=1)
    j = np.argmin(d2, axis=1)
    return j, d2[np.arange(len(j)), j]


def _ref_greedy_weighted_kmeanspp(vecs, weights, k: int):
    """Independent re-derivation of the greedy weighted k-means++
    reduction (the ~20-line driver-side step of
    operators/clustering.py::kmeans_init).  ADVICE r7: the literal
    oracle previously IMPORTED the live ``_greedy_weighted_kmeanspp``,
    so a bug in that step was invisible to the driver hash gate; this
    twin re-states the rules from scratch so the gate exercises them.

    Rules (candidates indexed 0..m-1 by the caller's re-keying):
    first center = heaviest weight, ties to the lowest index; each
    subsequent center = argmax of weight × squared-distance-to-nearest
    -chosen, ties to the lowest index."""
    import numpy as np

    x = np.asarray(vecs, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    m = len(w)
    start = 0
    for i in range(1, m):
        if w[i] > w[start]:
            start = i
    chosen = [start]
    taken = {start}
    near2 = np.sum((x - x[start]) ** 2, axis=1)
    while len(chosen) < min(k, m):
        gain = w * near2
        best, best_gain = -1, -1.0
        for i in range(m):
            if i in taken:
                continue
            if gain[i] > best_gain:
                best, best_gain = i, float(gain[i])
        chosen.append(best)
        taken.add(best)
        near2 = np.minimum(near2, np.sum((x - x[best]) ** 2, axis=1))
    return [x[i].tolist() for i in chosen]


def ref_kmeans_clusters(sf_dir: str, k: int = 8, max_iter: int = 12,
                        tol: float = 1e-4, rounds: int = 3,
                        seed: int = 0x5EED
                        ) -> list[tuple[int, int, int, int, int]]:
    """Expected (cell, n_points, min_id, max_id, cent_fp) rows of the
    ``kmeans_clusters`` registry query over the embeddings fixture."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    x = np.asarray(t.column("embedding").to_pylist(),
                   dtype=np.float32).astype(np.float64)
    vn2 = (x * x).sum(axis=1)
    ell = 2.0 * k

    # --- k-means|| init (clustering.py::kmeans_init) ---
    first = int(np.argmin(ids))
    cand_keys = {tuple(x[first])}
    cands = [x[first].copy()]
    for r in range(rounds):
        cmat = np.vstack(cands)
        _, d2 = _assign(x, vn2, cmat)
        phi = float(d2.sum())
        if phi <= 0.0:
            break
        thresh = np.minimum(1.0, ell * d2 / phi)
        u = np.array([hash01(int(p), seed + r) for p in ids])
        for i in np.nonzero(u < thresh)[0]:
            key = tuple(x[i])
            if key not in cand_keys:
                cand_keys.add(key)
                cands.append(x[i].copy())
    # re-key candidates 0..m-1 sorted lexicographically by vector
    # (Window.orderBy("cent") — Spark array<double> ordering)
    cands.sort(key=tuple)
    cmat = np.vstack(cands)
    a, _ = _assign(x, vn2, cmat)
    w = np.bincount(a, minlength=len(cands))
    centers = _ref_greedy_weighted_kmeanspp(
        [c.tolist() for c in cands], [int(v) for v in w], k)
    cents = np.asarray(centers, dtype=np.float64)

    # --- Lloyd to convergence (clustering.py::kmeans) ---
    history: list[float] = []
    for _ in range(max_iter):
        a, d2 = _assign(x, vn2, cents)
        new_cents = cents.copy()
        inertia = 0.0
        for c in range(k):
            m = a == c
            if m.any():
                new_cents[c] = x[m].mean(axis=0)
                inertia += float(d2[m].sum())
        cents = new_cents
        history.append(inertia)
        if (len(history) >= 2 and history[-2] > 0
                and (history[-2] - history[-1]) < tol * history[-2]):
            break

    # --- final assignment + output fingerprint ---
    import math

    def round_half_up(v: float) -> int:
        # Spark ROUND(double) is HALF_UP (away from zero), not
        # Python's half-even
        return (int(math.floor(v + 0.5)) if v >= 0
                else -int(math.floor(-v + 0.5)))

    a, _ = _assign(x, vn2, cents)
    rows = []
    for c in range(k):
        m = a == c
        if not m.any():
            continue  # inner join with sizes drops empty cells
        fp = int(sum(round_half_up(v * 1e6) for v in cents[c]))
        rows.append((c, int(m.sum()), int(ids[m].min()),
                     int(ids[m].max()), fp))
    return rows
