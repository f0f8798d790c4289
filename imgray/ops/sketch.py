"""HyperLogLog approximate distinct counting (Flajolet, Fusy, Gandouet,
Meunier — "HyperLogLog: the analysis of a near-optimal cardinality
estimation algorithm", AofA 2007; public algorithm).

Oracle-reproducible by construction: the register hash is the first
8 bytes of ``md5(str(value))`` (DuckDB: ``('0x' || substr(md5(s), 1,
16))::UBIGINT``), per-register maxima are small integers, the harmonic
sum is computed EXACTLY as a 2^53-scaled integer, and the one float
division / ``ln`` at the end is IEEE-identical between numpy-free
Python ``math`` and DuckDB's libm — so the approximate estimate
hash-matches the SQL oracle bit-for-bit, not just approximately.

Scale shape (100 TB): each block contributes one fixed 4096-byte
register-max partial regardless of row count; the driver combines
partials with elementwise max (associative + commutative, so block
order and batch boundaries never change the answer).  The md5-per-
distinct-value hash is the price of oracle reproducibility — values
are uniqued per block first so each block hashes its distinct values
once.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

P = 12
M = 1 << P                      # 4096 registers, ~1.04/sqrt(M) ≈ 1.6% err
_W = 64 - P                     # width of the rho word
_ALPHA = 0.7213 / (1 + 1.079 / M)


def hll_registers(values) -> np.ndarray:
    """Register-max array (uint8[M]) for an iterable of values; each
    value is hashed as md5(str(v))[:8] big-endian."""
    regs = np.zeros(M, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8],
                           "big")
        reg = h >> _W
        w = h & ((1 << _W) - 1)
        rho = _W - w.bit_length() + 1
        if rho > regs[reg]:
            regs[reg] = rho
    return regs


def hll_estimate(regs: np.ndarray) -> int:
    """Bias-corrected estimate with the small-range correction; the
    harmonic sum is exact integer arithmetic (2^53-scaled), so the
    only float ops are one division (or one ln) shared verbatim with
    the SQL oracle."""
    V = int((regs == 0).sum())
    S = sum(1 << (53 - int(r)) for r in regs)
    E = _ALPHA * M * M * float(1 << 53) / S
    if E <= 2.5 * M and V > 0:
        E = M * math.log(M / V)
    return math.floor(E + 0.5)


def hll_count(ds, col: str) -> int:
    """Approximate COUNT(DISTINCT col) over a Dataset — one streaming
    pass, one 4096-byte partial per block, elementwise-max combine."""

    def partial(batch: pa.Table) -> pa.Table:
        # nulls are dropped, matching SQL COUNT(DISTINCT) (str(None)
        # would otherwise hash as a real value the oracle never sees)
        u = pc.drop_null(pc.unique(batch.column(col)))
        regs = hll_registers(u.to_pylist())
        return pa.table({"regs": pa.array([regs.tobytes()],
                                          type=pa.binary())})

    total = np.zeros(M, dtype=np.uint8)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for raw in pa.table(b).column("regs").to_pylist():
            np.maximum(total, np.frombuffer(raw, dtype=np.uint8),
                       out=total)
    return hll_estimate(total)


# --------------------------------------------------- count-min sketch

CMS_W = 16384     # counters per hash row
CMS_D = 4         # hash rows; overestimate P ≈ (n/W)^D


def _cms_cell(token: str, j: int) -> int:
    h = int.from_bytes(
        hashlib.md5((str(j) + ":" + token).encode()).digest()[:8], "big")
    return h % CMS_W


def cms_registers(token_counts) -> np.ndarray:
    """(D, W) int64 counter matrix from a {token: count} mapping —
    each DISTINCT token is hashed once per row and contributes its
    full count, so heavy corpora pay md5 per distinct token, not per
    occurrence."""
    counts = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for tok, n in token_counts.items():
        for j in range(CMS_D):
            counts[j, _cms_cell(tok, j)] += n
    return counts


def cms_count(ds, text_col: str, probes: list[str]) -> "pa.Table":
    """Count-Min frequency estimates (Cormode & Muthukrishnan, 2005;
    public algorithm) for ``probes`` over whitespace tokens of
    ``text_col`` — one streaming pass, one fixed 512 KiB counter
    partial per block, summed on the driver.  Counter sums are
    order-invariant integers and the md5 cell hash is reproducible in
    SQL, so the ESTIMATES (never under, possibly over) hash-match a
    DuckDB oracle exactly.  (Tokenization caveat shared with the other
    text oracles: Python ``str.split`` breaks on Unicode whitespace
    while the oracle's RE2 ``\\s`` is ASCII-only — the two agree on the
    pure-ASCII test corpora.)"""
    from collections import Counter

    def partial(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch.column(text_col).to_pylist():
            c.update((t or "").split())
        return pa.table({"c": pa.array([cms_registers(c).tobytes()],
                                       type=pa.binary())})

    total = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for raw in pa.table(b).column("c").to_pylist():
            total += np.frombuffer(raw, dtype=np.int64).reshape(
                CMS_D, CMS_W)
    ests = [int(min(total[j, _cms_cell(p, j)] for j in range(CMS_D)))
            for p in probes]
    return pa.table({"p": pa.array(probes),
                     "est": pa.array(ests, type=pa.int64())})


def hll_count_grouped(ds, group_col: str, key_col: str) -> "pa.Table":
    """Approximate COUNT(DISTINCT key) per group for a LOW-cardinality
    group column — one streaming pass; each block emits one
    4096-byte register partial PER GROUP PRESENT IN THE BLOCK,
    max-combined per group on the driver.  Same md5/exact-integer
    construction as :func:`hll_count`, so a DuckDB oracle reproduces
    every per-group estimate bit-for-bit."""

    def partial(batch: pa.Table) -> pa.Table:
        # null KEYS are dropped (SQL COUNT(DISTINCT) semantics); null
        # GROUPS are kept, like SQL GROUP BY
        batch = batch.filter(pc.is_valid(batch.column(key_col)))
        t = (pa.table({group_col: batch.column(group_col),
                       key_col: batch.column(key_col)})
             .group_by([group_col, key_col]).aggregate([]))
        groups: dict = {}
        for g, k in zip(t.column(group_col).to_pylist(),
                        t.column(key_col).to_pylist()):
            groups.setdefault(g, []).append(k)
        gs, regs = [], []
        for g, keys in groups.items():
            gs.append(g)
            regs.append(hll_registers(keys).tobytes())
        return pa.table({"g": pa.array(gs),
                         "regs": pa.array(regs, type=pa.binary())})

    totals: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        for g, raw in zip(t.column("g").to_pylist(),
                          t.column("regs").to_pylist()):
            cur = totals.setdefault(g, np.zeros(M, dtype=np.uint8))
            np.maximum(cur, np.frombuffer(raw, dtype=np.uint8),
                       out=cur)
    gs = sorted(totals, key=lambda g: (g is None, str(g)))
    return pa.table({
        group_col: pa.array(gs),
        "n_approx": pa.array([hll_estimate(totals[g]) for g in gs],
                             type=pa.int64()),
    })
