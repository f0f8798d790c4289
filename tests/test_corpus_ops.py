"""Unit tests for corpus-level ops (repetition stats, n-gram counts,
inverted index, rare terms) and PII scrubbing — handwritten
expectations on tiny crafted inputs; oracle conformance is covered by
test_queries.py.
"""

import pyarrow as pa

from imgray.ops.corpus import (inverted_index, ngram_counts, rare_terms,
                               repetition_stats_batch, tfidf_top_terms)
from imgray.ops.text import pii_scrub, pii_scrub_batch


def _tbl(docs):
    return pa.table({"doc_id": pa.array([d for d, _ in docs],
                                        type=pa.int64()),
                     "text": pa.array([t for _, t in docs],
                                      type=pa.string())})


def _ds(docs):
    import ray.data

    return ray.data.from_arrow(_tbl(docs))


# ------------------------------------------------------ repetition stats

def test_repetition_stats_handwritten():
    out = repetition_stats_batch(_tbl([
        (0, "a b a b a b"),          # bigrams: "a b"x3 "b a"x2 → 3/5
        (1, "x y"),                  # exactly one bigram → 10000
        (2, "z"),                    # too short for any n-gram
        (3, ""),                     # empty
        (4, "a b c d e a b c d e a b c d e"),  # repeated 5-gram run
    ]))
    d = {r["doc_id"]: r for r in out.to_pylist()}
    assert d[0]["top_bigram_bp"] == 6000            # 3/5
    assert d[1]["top_bigram_bp"] == 10000
    assert d[1]["top_trigram_bp"] == 0
    assert d[2]["top_bigram_bp"] == 0
    assert d[3]["top_bigram_bp"] == 0 and d[3]["dup_5gram_bp"] == 0
    # doc 4: 15 tokens → 11 5-grams, 10 distinct ("a b c d e" twice...)
    # occurrences: positions 0,5,10 give "a b c d e" 3x; total 11,
    # distinct = 9 → (11-9)/11
    n5, distinct = 11, len({
        tuple("a b c d e a b c d e a b c d e".split()[i:i + 5])
        for i in range(11)})
    import math
    assert d[4]["dup_5gram_bp"] == math.floor(
        (n5 - distinct) / n5 * 10000 + 0.5)


# ------------------------------------------------------------ PII scrub

def test_pii_scrub_handwritten():
    red, e, p, i = pii_scrub(
        "mail bob.smith+x@sub.example.org call +1 555-123-4567 "
        "host 10.0.0.255 done")
    assert (e, p, i) == (1, 1, 1)
    assert red == "mail <EMAIL> call <PHONE> host <IP> done"
    # no PII → untouched
    red2, e2, p2, i2 = pii_scrub("plain words only")
    assert red2 == "plain words only" and (e2, p2, i2) == (0, 0, 0)
    # ip digits never double-counted as phone (no dash/space separators)
    red3, _, p3, i3 = pii_scrub("ip 192.168.1.2 end")
    assert p3 == 0 and i3 == 1 and "<IP>" in red3


def test_pii_scrub_batch_schema():
    out = pii_scrub_batch(_tbl([(7, "a@b.co x"), (8, "nothing")]))
    assert out.column_names == ["doc_id", "n_email", "n_phone", "n_ip",
                                "redacted_md5"]
    rows = {r["doc_id"]: r for r in out.to_pylist()}
    assert rows[7]["n_email"] == 1 and rows[8]["n_email"] == 0
    assert rows[7]["redacted_md5"] != rows[8]["redacted_md5"]


# --------------------------------------------------------- corpus n-grams

def test_ngram_counts_topk(ray_session):
    ds = _ds([(0, "a b a b"), (1, "a b c"), (2, "c a b")])
    t = ngram_counts(ds, n=2, top_k=2)
    rows = t.to_pylist()
    # "a b" occurs 2+1+1 = 4; next best 1 — ties break gram ASC
    assert rows[0] == {"gram": "a b", "cnt": 4}
    assert rows[1]["cnt"] == 1 and rows[1]["gram"] == "b a"
    assert len(rows) == 2


# --------------------------------------------------------- inverted index

def test_inverted_index_and_posting_cap(ray_session):
    ds = _ds([(3, "w q"), (1, "w"), (2, "w w q z")])
    t = pa.concat_tables([pa.table(b) for b in inverted_index(
        ds, posting_cap=2).iter_batches(batch_format="pyarrow")])
    rows = {r["term"]: r for r in t.to_pylist()}
    assert rows["w"]["df"] == 3
    assert rows["w"]["posting"] == "1,2"      # capped at 2, sorted
    assert rows["q"]["df"] == 2 and rows["q"]["posting"] == "2,3"
    assert rows["z"]["df"] == 1 and rows["z"]["posting"] == "2"


# ------------------------------------------------------------ rare terms

def test_rare_terms_rank_order(ray_session):
    # df: common=3, mid=2, rare1=1, rare2=1
    ds = _ds([(0, "common mid rare1 rare2"),
              (1, "common mid"),
              (2, "common")])
    t = pa.concat_tables([pa.table(b) for b in rare_terms(
        ds, k=3).iter_batches(batch_format="pyarrow")])
    doc0 = sorted((r for r in t.to_pylist() if r["doc_id"] == 0),
                  key=lambda r: r["rank"])
    assert [(r["term"], r["df"]) for r in doc0] == [
        ("rare1", 1), ("rare2", 1), ("mid", 2)]
    doc2 = [r for r in t.to_pylist() if r["doc_id"] == 2]
    assert len(doc2) == 1 and doc2[0]["term"] == "common"


def _rows_set(dsout) -> set:
    tbls = [pa.table(b) for b in dsout.iter_batches(batch_format="pyarrow")]
    if not tbls:
        return set()
    cols = sorted(tbls[0].column_names)
    out = set()
    for t in tbls:
        out.update(zip(*[t.column(c).to_pylist() for c in cols]))
    return out


def test_rare_terms_partitioned_identical_to_broadcast(ray_session):
    """VERDICT r3 #5: the hash-partitioned term→df path (no O(vocab)
    broadcast) must produce exactly the broadcast path's rows."""
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = [f"w{j}" for j in range(120)]
    docs = [(i, " ".join(rng.choice(vocab,
                                    size=rng.integers(3, 25)).tolist()))
            for i in range(150)]
    ds = _ds(docs)
    b = _rows_set(rare_terms(_ds(docs), k=3, mode="broadcast"))
    p = _rows_set(rare_terms(ds, k=3, mode="partitioned",
                             num_partitions=7))
    assert p == b and len(b) > 0


def test_tfidf_partitioned_identical_to_broadcast(ray_session):
    import numpy as np

    rng = np.random.default_rng(9)
    vocab = [f"t{j}" for j in range(80)]
    docs = [(i, " ".join(rng.choice(vocab,
                                    size=rng.integers(2, 30)).tolist()))
            for i in range(120)]
    b = _rows_set(tfidf_top_terms(_ds(docs), k=3, mode="broadcast"))
    p = _rows_set(tfidf_top_terms(_ds(docs), k=3, mode="partitioned",
                                  num_partitions=5))
    assert p == b and len(b) > 0


def test_rare_terms_auto_threshold_picks_partitioned(ray_session):
    ds = _ds([(0, "a b c"), (1, "a d"), (2, "a e f")])
    got = _rows_set(rare_terms(ds, k=2, vocab_threshold=2))
    want = _rows_set(rare_terms(_ds([(0, "a b c"), (1, "a d"),
                                     (2, "a e f")]), k=2,
                                mode="broadcast"))
    assert got == want and len(got) > 0
