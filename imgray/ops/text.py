"""Text-analysis operators: language-ID, quality scoring, token
counting, document fingerprinting.  Vectorized per batch (pyarrow
compute / numpy); heavier per-doc work is plain Python over a batch
(still one task per block, no per-row Dataset ops).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_RE = r"\s+"

# tiny per-language stopword profiles (public common-word lists)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "por"},
}

_WORD = re.compile(r"\w+", re.UNICODE)
_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + a BPE-ish subword estimate (chars/4
    heuristic + punctuation splits), fully vectorized."""
    col = batch.column(text_col)
    trimmed = pc.utf8_trim_whitespace(col)
    splits = pc.split_pattern_regex(trimmed, pattern=_TOKEN_RE)
    ws = pc.list_value_length(splits)
    nchars = pc.utf8_length(col)
    bpe_est = pc.add(pc.divide(nchars, 4), 1)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pc.cast(ws, pa.int64()),
        "n_chars": pc.cast(nchars, pa.int64()),
        "bpe_est": pc.cast(bpe_est, pa.int64()),
    })


def langid(text: str) -> str:
    """n-gram/stopword heuristic language ID."""
    if not text:
        return "und"
    cjk = sum(1 for c in text if "一" <= c <= "鿿")
    if cjk / max(1, len(text)) > 0.05:
        return "zh"
    toks = [t.lower() for t in _WORD.findall(text)]
    if not toks:
        return "und"
    ts = set(toks)
    best, best_score = "und", 0.0
    for lang, sw in _STOPWORDS.items():
        score = len(ts & sw) / len(sw)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "en"


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    preds = [langid(t) for t in batch.column(text_col).to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "pred_lang": pa.array(preds, type=pa.string()),
    })


def quality_score(text: str) -> dict:
    """Length / punctuation / stopword-ratio quality features + a
    composite score in [0,1] (C4/Gopher-style heuristics)."""
    if not text:
        return {"mean_word_len": 0.0, "punct_ratio": 0.0,
                "stop_ratio": 0.0, "score": 0.0}
    toks = _WORD.findall(text)
    n = len(text)
    mean_wl = float(np.mean([len(t) for t in toks])) if toks else 0.0
    punct = len(_PUNCT.findall(text)) / n
    lower = [t.lower() for t in toks]
    stop = (sum(1 for t in lower if t in _STOPWORDS["en"]) / len(lower)
            if lower else 0.0)
    length_ok = min(1.0, len(toks) / 50.0)
    wl_ok = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
    punct_ok = 1.0 if punct < 0.2 else 0.5
    score = round(length_ok * wl_ok * punct_ok, 4)
    return {"mean_word_len": round(mean_wl, 4), "punct_ratio": round(punct, 4),
            "stop_ratio": round(stop, 4), "score": score}


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    feats = [quality_score(t) for t in batch.column(text_col).to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "mean_word_len": pa.array([f["mean_word_len"] for f in feats]),
        "punct_ratio": pa.array([f["punct_ratio"] for f in feats]),
        "stop_ratio": pa.array([f["stop_ratio"] for f in feats]),
        "score": pa.array([f["score"] for f in feats]),
    })


_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = (1 << 64) - 1


def _gram_hash_fnv(s: bytes) -> int:
    h = _FNV_OFFSET
    for b in s:
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h


def _gram_hash_md5(s: bytes) -> int:
    import hashlib

    return int.from_bytes(hashlib.md5(s).digest()[:8], "big")


def rolling_fingerprint(text: str, k: int = 8, window: int = 16,
                        gram_hash: str = "fnv") -> int:
    """Winnowing-style document fingerprint: hash every byte k-gram,
    take the min per NON-overlapping window, XOR-fold the selected
    mins → signed int64.

    ``gram_hash="fnv"`` (default) is the fast library path;
    ``gram_hash="md5"`` (first 8 bytes of md5) makes the whole
    structure reproducible in a DuckDB oracle — window minima, the
    bit_xor fold and the short-text fallback included — so the
    winnowing logic itself is conformance-checked."""
    gh = _gram_hash_fnv if gram_hash == "fnv" else _gram_hash_md5
    s = (text or "").lower().encode("utf-8")
    if len(s) < k:
        return int(np.uint64(gh(s)).view(np.int64))
    hs = np.fromiter((gh(s[i:i + k]) for i in range(len(s) - k + 1)),
                     dtype=np.uint64, count=len(s) - k + 1)
    sel = np.uint64(0)
    for w in range(0, len(hs), window):
        sel ^= hs[w : w + window].min()
    return int(sel.view(np.int64))


def fingerprint_batch(batch: pa.Table, text_col: str = "text",
                      gram_hash: str = "fnv") -> pa.Table:
    fps = [rolling_fingerprint(t, gram_hash=gram_hash)
           for t in batch.column(text_col).to_pylist()]
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "fingerprint": pa.array(fps, type=pa.int64()),
    })


def _bp(v: float) -> int:
    """Basis points with round-half-away (matches DuckDB round())."""
    import math

    return int(math.floor(v * 10000.0 + 0.5))


def quality_bp_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """quality_score emitted as integer basis points — exactly
    reproducible in SQL (both engines divide the same small integers in
    double and round half-away), so the quality heuristic gets a DuckDB
    oracle instead of a rows-only check."""
    rows = {"mwl_bp": [], "punct_bp": [], "stop_bp": [], "score_bp": []}
    for text in batch.column(text_col).to_pylist():
        if not text:
            for k in rows:
                rows[k].append(0)
            continue
        toks = _WORD.findall(text)
        n = len(text)
        mwl = (sum(len(t) for t in toks) / len(toks)) if toks else 0.0
        punct = len(_PUNCT.findall(text)) / n
        lower = [t.lower() for t in toks]
        stop = (sum(1 for t in lower if t in _STOPWORDS["en"]) / len(lower)
                if lower else 0.0)
        length_ok = min(1.0, len(toks) / 50.0)
        wl_ok = 1.0 if 3.0 <= mwl <= 10.0 else 0.5
        punct_ok = 1.0 if punct < 0.2 else 0.5
        rows["mwl_bp"].append(_bp(mwl))
        rows["punct_bp"].append(_bp(punct))
        rows["stop_bp"].append(_bp(stop))
        rows["score_bp"].append(_bp(length_ok * wl_ok * punct_ok))
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "mwl_bp": pa.array(rows["mwl_bp"], type=pa.int64()),
        "punct_bp": pa.array(rows["punct_bp"], type=pa.int64()),
        "stop_bp": pa.array(rows["stop_bp"], type=pa.int64()),
        "score_bp": pa.array(rows["score_bp"], type=pa.int64()),
    })


# ----------------------------------------------------------- PII scrubbing

# Patterns restricted to syntax RE2 (DuckDB) and Python `re` treat
# identically (greedy leftmost-first, no backrefs/lookaround), so the
# scrub is exactly reproducible by a `regexp_replace(..., 'g')` oracle.
_PII_EMAIL = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
_PII_PHONE = re.compile(r"\+?[0-9]{1,3}[- ][0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}")
_PII_IPV4 = re.compile(
    r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")


def pii_scrub(text: str) -> tuple[str, int, int, int]:
    """Redact emails, phone-like numbers and IPv4 addresses (standard
    LLM training-data hygiene).  Returns (redacted, n_email, n_phone,
    n_ip).  Replacement order is fixed (email → phone → ip) so engine
    and oracle see identical intermediate strings."""
    t = text or ""
    n_email = len(_PII_EMAIL.findall(t))
    t = _PII_EMAIL.sub("<EMAIL>", t)
    n_phone = len(_PII_PHONE.findall(t))
    t = _PII_PHONE.sub("<PHONE>", t)
    n_ip = len(_PII_IPV4.findall(t))
    t = _PII_IPV4.sub("<IP>", t)
    return t, n_email, n_phone, n_ip


def pii_scrub_batch(batch: pa.Table, text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """One map_batches pass: per doc, PII counts plus the md5 of the
    redacted text (the hash keeps the oracle row narrow while still
    pinning every replaced byte)."""
    import hashlib

    n_em, n_ph, n_ip, fps = [], [], [], []
    for t in batch.column(text_col).to_pylist():
        red, e, p, i = pii_scrub(t)
        n_em.append(e)
        n_ph.append(p)
        n_ip.append(i)
        fps.append(hashlib.md5(red.encode()).hexdigest())
    return pa.table({
        id_col: batch.column(id_col),
        "n_email": pa.array(n_em, type=pa.int64()),
        "n_phone": pa.array(n_ph, type=pa.int64()),
        "n_ip": pa.array(n_ip, type=pa.int64()),
        "redacted_md5": pa.array(fps, type=pa.string()),
    })


# ------------------------------------------------ benchmark decontamination

def ws_ngrams(text: str, n: int = 8) -> list[str]:
    """Whitespace-token n-grams joined with single spaces — the same
    tokenizer as token_count_batch (trim + split on \\s+), so the
    DuckDB oracle can reproduce it exactly."""
    toks = (text or "").split()
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def extract_benchmark_ngrams(ds, pred_fn, text_col: str = "text",
                             id_col: str = "doc_id", n: int = 8) -> set:
    """Collect the benchmark side's n-gram set (tiny: benchmarks are
    thousands of documents, not billions).  ``pred_fn(batch) → mask``
    selects benchmark rows per batch."""
    import pyarrow as _pa

    def grams(batch: _pa.Table) -> _pa.Table:
        keep = pred_fn(batch)
        sub = batch.filter(keep)
        out = []
        for t in sub.column(text_col).to_pylist():
            out.extend(ws_ngrams(t, n))
        return _pa.table({"gram": _pa.array(sorted(set(out)),
                                            type=_pa.string())})

    rows = ds.map_batches(grams, batch_format="pyarrow").take_all()
    return {r["gram"] for r in rows}


def decontaminate_batch(batch: pa.Table, bench_ref, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 8) -> pa.Table:
    """Flag training documents that overlap a benchmark n-gram set
    (decontamination, the standard LLM-data hygiene step): per doc,
    the count of DISTINCT benchmark n-grams present and a contaminated
    flag.  ``bench_ref`` is a ray.put handle to the benchmark set —
    broadcast once, read zero-copy per task, no shuffle."""
    import ray as _ray

    bench = _ray.get(bench_ref) if not isinstance(bench_ref, set) \
        else bench_ref
    ids = batch.column(id_col).to_pylist()
    hits = []
    for t in batch.column(text_col).to_pylist():
        hits.append(len(set(ws_ngrams(t, n)) & bench))
    return pa.table({
        id_col: pa.array(ids, type=pa.int64()),
        "bench_hits": pa.array(hits, type=pa.int64()),
        "contaminated": pa.array([h > 0 for h in hits], type=pa.bool_()),
    })
