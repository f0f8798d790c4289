"""Relational building blocks Ray Data lacks natively: shuffle
semi/anti-joins, a large×large shuffle hash join, and exact
distributed quantiles over integer columns.

Scale notes (100 TB):
- the semi/anti-joins never broadcast the big side: both inputs are reduced
  to (key[, payload]) rows, tagged, and combined in ONE coarse
  hash-partitioned groupby — the right side contributes only its
  per-block-distinct keys to the shuffle;
- the hash join shuffles both sides exactly once (tagged union on a
  coarse hash partition of the key) and matches inside each partition
  with Arrow's native C++ hash join — no broadcast, no Python-row
  matching, and the output stays hash-partitioned by the join key so
  a downstream per-key aggregate needs NO further exchange;
- exact quantiles use iterative histogram refinement (the classic
  distributed k-th-element algorithm): each pass is one streaming
  ``map_batches`` producing a fixed 64 Ki-bucket count partial per
  block (512 KiB), summed on the driver; integer domains ≤ 2^32 need
  at most two passes and nothing is ever sorted or materialized.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _hash_partition_column, coarse_partition_groups


# ------------------------------------------------------------ anti-join

def anti_join(left_ds, right_ds, key: str, payload_cols: list[str],
              num_partitions: int = 64):
    """Rows of ``left_ds`` whose ``key`` never appears in ``right_ds``
    (NOT EXISTS / anti semi-join).

    Both sides shuffle only once: left rows carry their payload, the
    right side is reduced to per-block-DISTINCT keys before the
    exchange, and a coarse hash-partitioned combine drops every key
    run that saw a right-side row.  Returns
    Dataset[{key, *payload_cols}].
    """
    return _semi_anti(left_ds, right_ds, key, payload_cols,
                      num_partitions, keep_matched=False)


def semi_join(left_ds, right_ds, key: str, payload_cols: list[str],
              num_partitions: int = 64):
    """Rows of ``left_ds`` whose ``key`` appears at least once in
    ``right_ds`` (EXISTS / semi-join) — same one-shuffle topology as
    :func:`anti_join`, opposite keep mask."""
    return _semi_anti(left_ds, right_ds, key, payload_cols,
                      num_partitions, keep_matched=True)


def _semi_anti(left_ds, right_ds, key: str, payload_cols: list[str],
               num_partitions: int, keep_matched: bool):

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {key: batch.column(key)}
        for c in payload_cols:
            cols[c] = batch.column(c)
        cols["_r"] = pa.array(np.zeros(batch.num_rows, dtype=np.int8))
        return pa.table(cols)

    # right-side payload columns are null-typed to the left schema so
    # the two tagged streams union cleanly
    def tag_right_typed(batch: pa.Table) -> pa.Table:
        keys = pc.unique(batch.column(key))
        cols = {key: keys}
        for c in payload_cols:
            cols[c] = pa.nulls(len(keys), type=left_types[c])
        cols["_r"] = pa.array(np.ones(len(keys), dtype=np.int8))
        return pa.table(cols)

    left_types = {c: left_ds.schema().base_schema.field(c).type
                  for c in payload_cols}

    tagged = (left_ds.map_batches(tag_left, batch_format="pyarrow")
              .union(right_ds.map_batches(tag_right_typed,
                                          batch_format="pyarrow")))

    def combine(part: pa.Table) -> pa.Table:
        kc = part.column(key)
        # keys with any right-side row
        right_keys = pc.unique(pc.filter(
            kc, pc.equal(part.column("_r"), 1)))
        keep = pc.is_in(kc, value_set=right_keys)
        if not keep_matched:
            keep = pc.invert(keep)
        keep = pc.and_(keep, pc.equal(part.column("_r"), 0))
        out = part.filter(keep)
        return out.drop_columns(["_r"])

    return coarse_partition_groups(tagged, key, combine, num_partitions)


def intersect_keys(a_ds, b_ds, key: str, num_partitions: int = 64):
    """SQL ``INTERSECT`` over one key column: distinct keys present in
    BOTH inputs.  Same one-exchange topology as the semi/anti joins —
    each side is reduced to per-block-distinct keys before the
    shuffle, so only distinct values cross the wire."""
    return _set_op(a_ds, b_ds, key, num_partitions, op="intersect")


def except_keys(a_ds, b_ds, key: str, num_partitions: int = 64):
    """SQL ``EXCEPT``: distinct keys of ``a_ds`` absent from
    ``b_ds``."""
    return _set_op(a_ds, b_ds, key, num_partitions, op="except")


def _set_op(a_ds, b_ds, key: str, num_partitions: int, op: str):
    # SQL set-op semantics: NULL compares equal to NULL (IS NOT
    # DISTINCT FROM), unlike join keys — handled explicitly below
    # because pc.is_in's null matching differs.

    def distinct_tagged(side: int):
        def f(batch: pa.Table) -> pa.Table:
            keys = pc.unique(batch.column(key))
            return pa.table({
                key: keys,
                "_r": pa.array(np.full(len(keys), side, dtype=np.int8)),
            })
        return f

    tagged = (a_ds.map_batches(distinct_tagged(0), batch_format="pyarrow")
              .union(b_ds.map_batches(distinct_tagged(1),
                                      batch_format="pyarrow")))

    def combine(part: pa.Table) -> pa.Table:
        kc = part.column(key)
        tags = part.column("_r")
        a_keys = pc.unique(pc.filter(kc, pc.equal(tags, 0)))
        b_keys = pc.unique(pc.filter(kc, pc.equal(tags, 1)))
        a_null = a_keys.null_count > 0
        b_null = b_keys.null_count > 0
        a_vals = a_keys.drop_null()
        in_b = pc.is_in(a_vals, value_set=b_keys.drop_null())
        if op == "intersect":
            out = a_vals.filter(in_b)
            keep_null = a_null and b_null
        else:
            out = a_vals.filter(pc.invert(in_b))
            keep_null = a_null and not b_null
        if keep_null:
            # out is always a plain Array here (pc.unique returns one
            # and drop_null/filter preserve it)
            out = pa.concat_arrays([out, pa.nulls(1, type=kc.type)])
        return pa.table({key: out})

    return coarse_partition_groups(tagged, key, combine, num_partitions)


# ------------------------------------------------------- bloom filter

_BLOOM_C1 = np.uint64(0x9E3779B97F4A7C15)
_BLOOM_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_hashes(keys) -> tuple[np.ndarray, np.ndarray]:
    """Two vectorized 64-bit hash streams per key (Kirsch–Mitzenmacher
    double hashing).  Integer keys are mixed in numpy; other types
    fall back to blake2b per value."""
    if pa.types.is_integer(keys.type):
        v = pc.cast(keys, pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.uint64)
        h1 = v * _BLOOM_C1
        h1 ^= h1 >> np.uint64(29)
        h2 = (v * _BLOOM_C2) | np.uint64(1)
        return h1, h2
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) \
        else keys
    enc = pc.dictionary_encode(arr)
    uniq = enc.dictionary.to_pylist() + [None]  # sentinel for nulls
    u1 = np.empty(len(uniq), dtype=np.uint64)
    u2 = np.empty(len(uniq), dtype=np.uint64)
    for i, s in enumerate(uniq):
        d = hashlib.blake2b(str(s).encode(), digest_size=16).digest()
        u1[i] = int.from_bytes(d[:8], "big")
        u2[i] = int.from_bytes(d[8:], "big") | 1
    idx = pc.fill_null(enc.indices,
                       len(uniq) - 1).to_numpy(zero_copy_only=False) \
        .astype(np.int64)
    return u1[idx], u2[idx]


def build_bloom(ds, key: str, nbits: int = 1 << 23,
                nhash: int = 4) -> np.ndarray:
    """Bloom filter over a key column: each block emits one fixed
    ``nbits/8``-byte bit-array partial (1 MiB at the default 8M bits),
    OR-combined on the driver — deterministic regardless of block
    order, so join results never depend on scheduling."""
    nwords = nbits // 64

    def partial(batch: pa.Table) -> pa.Table:
        h1, h2 = _bloom_hashes(batch.column(key))
        words = np.zeros(nwords, dtype=np.uint64)
        for j in range(nhash):
            idx = (h1 + np.uint64(j) * h2) % np.uint64(nbits)
            np.bitwise_or.at(words, (idx >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"w": pa.array([words.tobytes()],
                                       type=pa.binary())})

    total = np.zeros(nwords, dtype=np.uint64)
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        for raw in pa.table(b).column("w").to_pylist():
            np.bitwise_or(total, np.frombuffer(raw, dtype=np.uint64),
                          out=total)
    return total


def bloom_contains(words: np.ndarray, keys,
                   nhash: int = 4) -> np.ndarray:
    """Vectorized membership mask (true = possibly present; false =
    definitely absent)."""
    nbits = np.uint64(len(words) * 64)
    h1, h2 = _bloom_hashes(keys)
    mask = np.ones(len(h1), dtype=bool)
    for j in range(nhash):
        idx = (h1 + np.uint64(j) * h2) % nbits
        bit = (words[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        mask &= bit.astype(bool)
    return mask


# ---------------------------------------------------- shuffle hash join

def _column_u64(keys: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Vectorized full-width uint64 mix per key value (integer: Knuth
    multiply + xorshift; other types: blake2b of the string form).
    Used to combine COMPOSITE join keys into one partition hash —
    single-column stages keep routing through the shared
    _hash_partition_column so their co-partitioning is unchanged."""
    if pa.types.is_integer(keys.type):
        v = pc.fill_null(pc.cast(keys, pa.int64()), 0).to_numpy(
            zero_copy_only=False)
        with np.errstate(over="ignore"):
            x = v.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        return x ^ (x >> np.uint64(33))
    # hash each DISTINCT value once, scatter via dictionary indices
    arr = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray)         else keys
    enc = pc.dictionary_encode(arr)
    uniq = enc.dictionary.to_pylist() + [None]  # sentinel for nulls
    uh = np.array(
        [int.from_bytes(hashlib.blake2b(str(k).encode(),
                                        digest_size=8).digest(), "big")
         for k in uniq],
        dtype=np.uint64)
    idx = pc.fill_null(enc.indices,
                       len(uniq) - 1).to_numpy(zero_copy_only=False)
    return uh[idx.astype(np.int64)]


def _keys_u64(batch: pa.Table, keys: list[str]) -> np.ndarray:
    """Combined uint64 key hash per row (polynomial over the
    per-column mixes)."""
    h = _column_u64(batch.column(keys[0]))
    for k in keys[1:]:
        with np.errstate(over="ignore"):
            h = h * np.uint64(1099511628211) ^ _column_u64(batch.column(k))
    return h


def _partition_on_keys(batch: pa.Table, keys: list[str],
                       num_partitions: int) -> pa.Array:
    """Partition ids for one or more key columns.  Single keys reuse
    THE shared partitioner; composite keys polynomial-combine the
    per-column mixes, so any two stages keyed on the same column list
    (same order) are co-partitioned by construction."""
    if len(keys) == 1:
        return _hash_partition_column(batch.column(keys[0]),
                                      num_partitions)
    h = _keys_u64(batch, keys)
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32))


_SALT_MIX = np.uint64(0xC2B2AE3D27D4EB4F)


def _salted_parts(h: np.ndarray, salt: np.ndarray,
                  num_partitions: int) -> np.ndarray:
    """Partition id for (key hash, salt) — salt 0..S-1 spreads one key
    over S distinct partition slots."""
    with np.errstate(over="ignore"):
        m = h ^ (salt.astype(np.uint64) + np.uint64(1)) * _SALT_MIX
        m ^= m >> np.uint64(29)
    return (m % np.uint64(num_partitions)).astype(np.int32)


def hot_key_hashes(ds, keys: list[str], hot_frac: float) -> np.ndarray:
    """Combined-u64 hashes of keys that fill ≥ ``hot_frac`` of ANY
    block — by pigeonhole this catches every key holding ≥ hot_frac
    of the whole dataset (plus harmless locally-heavy extras), while
    each block contributes at most 1/hot_frac candidate hashes, so the
    driver combine stays tiny at any scale."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.int64())})
        h = _keys_u64(batch, keys).view(np.int64)
        t = (pa.table({"h": pa.array(h)})
             .group_by("h").aggregate([([], "count_all")]))
        # floor of 2: a floor of 1 would flag EVERY distinct key of a
        # block smaller than 1/hot_frac rows, degenerating the salting
        # into S-fold full right-side replication and an unbounded
        # driver set.  Blocks under 2/hot_frac rows weaken detection
        # (conservative — a missed hot key only costs balance, never
        # correctness); real-scale 32 MiB blocks are far above that.
        thr = max(2, int(math.ceil(batch.num_rows * hot_frac)))
        return t.filter(pc.greater_equal(t.column("count_all"),
                                         thr)).select(["h"])

    out = set()
    for b in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow"):
        out.update(pa.table(b).column("h").to_pylist())
    return np.sort(np.array(sorted(out), dtype=np.int64))


def hash_join(left_ds, right_ds, key: str | list[str],
              left_cols: list[str], right_cols: list[str],
              num_partitions: int = 64,
              how: str = "inner", bloom_from: str | None = None,
              post_join=None, salt_hot_keys: int | None = None,
              hot_frac: float = 0.01):
    """Equi-join of two LARGE datasets — neither side broadcast.
    ``how`` is ``"inner"``, ``"left"``, ``"right"`` or ``"full"``
    (outer joins: unmatched rows of the preserved side(s) survive with
    null columns from the other side; in a full outer join the key
    column is coalesced across sides, matching SQL's
    ``COALESCE(l.key, r.key)``).  Null join keys never match — SQL
    semantics — but null-key rows of a preserved side still surface in
    the outer variants.

    ``post_join`` (optional) is applied to each partition's complete
    joined table INSIDE the partition task.  This is the only sound
    place for per-key aggregates that exploit key co-location:
    ``map_groups`` guarantees the UDF sees the whole partition, but
    Ray Data's dynamic block splitting may split the OUTPUT into
    several blocks, so downstream per-batch code must never assume
    one batch == one partition.

    ``bloom_from="left"`` (or ``"right"``) builds a Bloom filter over
    that side's keys in an extra streaming pass (one 1 MiB OR-combined
    partial per block, broadcast once via ray.put) and drops the
    OTHER side's definitely-unmatched rows BEFORE the shuffle — for a
    selective join this removes most of the exchange volume at the
    cost of re-reading the filtering side.  False positives only, so
    results are identical.  With ``how="left"`` only
    ``bloom_from="left"`` is sound (filtering the left side would
    drop rows that must survive unmatched).

    Topology: both inputs are projected to (key, payload, side-tag)
    rows, unioned, and exchanged ONCE on a coarse hash partition of
    the key; inside each partition the two sides are split by tag and
    matched with Arrow's native hash join (``pa.Table.join``), so
    duplicate keys on either side produce the full SQL cross product
    and the matching itself is vectorized C++.  The result Dataset is
    hash-partitioned by ``key`` — a downstream per-key (or
    per-key-plus-functionally-dependent-column) aggregate is exact
    per block with no further shuffle.

    ``left_cols`` / ``right_cols`` must be disjoint payload column
    name sets (the join key is carried once).

    ``key`` may be a LIST of column names for a composite equi-join:
    the exchange partitions on a polynomial combine of the per-column
    hashes and Arrow matches on the full tuple.  Bloom pre-filtering
    is single-key only (the filter hashes one column).

    ``salt_hot_keys=S`` enables EXPLICIT SKEW MITIGATION: a streaming
    pre-pass finds keys filling ≥ ``hot_frac`` of any left-side block
    (pigeonhole-complete for globally-hot keys, bounded candidates
    per block), broadcasts their hashes once, then spreads each hot
    key's LEFT rows across S partition slots by a deterministic salt
    while the RIGHT side's hot-key rows are replicated once per salt
    — every match still happens exactly once, so results are
    identical to the unsalted join, but a key holding half the input
    occupies S tasks instead of one straggler.  Inner/left only
    (replicas would corrupt unmatched-right detection) and not
    combinable with ``post_join`` (a hot key's output spans S
    partitions, breaking per-key co-location).  Over-detection (a
    locally-heavy or hash-colliding key) only costs a few extra
    replicated rows, never correctness.
    """
    keys = [key] if isinstance(key, str) else list(key)
    if not keys:
        raise ValueError("at least one join key is required")
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unsupported join type: {how!r}")
    if bloom_from is not None and len(keys) > 1:
        raise ValueError("bloom_from requires a single join key")
    if bloom_from not in (None, "left", "right"):
        raise ValueError(f"bad bloom_from: {bloom_from!r}")
    if how == "left" and bloom_from == "right":
        raise ValueError(
            "bloom_from='right' would drop unmatched left rows that a "
            "left outer join must keep; use bloom_from='left'")
    if how == "right" and bloom_from == "left":
        raise ValueError(
            "bloom_from='left' would drop unmatched right rows that a "
            "right outer join must keep; use bloom_from='right'")
    if how == "full" and bloom_from is not None:
        raise ValueError("a full outer join preserves both sides; "
                         "Bloom pre-filtering would drop rows")
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"payload columns appear on both sides: {overlap}")
    if salt_hot_keys is not None:
        if salt_hot_keys < 2:
            raise ValueError("salt_hot_keys must be >= 2")
        if how not in ("inner", "left"):
            raise ValueError("salting replicates right rows, which "
                             "corrupts unmatched-right detection: "
                             "inner/left only")
        if post_join is not None:
            raise ValueError("salting spreads a hot key over several "
                             "partitions, breaking the per-key "
                             "co-location post_join relies on")

    if bloom_from is not None:
        import ray as _ray

        src = left_ds if bloom_from == "left" else right_ds
        words_ref = _ray.put(build_bloom(src, keys[0]))

        def prefilter(batch: pa.Table) -> pa.Table:
            words = _ray.get(words_ref)
            return batch.filter(pa.array(
                bloom_contains(words, batch.column(keys[0]))))

        if bloom_from == "left":
            right_ds = right_ds.map_batches(prefilter,
                                            batch_format="pyarrow")
        else:
            left_ds = left_ds.map_batches(prefilter,
                                          batch_format="pyarrow")

    hot_ref = None
    if salt_hot_keys is not None:
        import ray as _ray

        # streaming pre-pass: hashes of locally-heavy keys, broadcast once
        hot_ref = _ray.put(hot_key_hashes(left_ds, keys, hot_frac))

    left_types = {c: left_ds.schema().base_schema.field(c).type
                  for c in left_cols}
    right_types = {c: right_ds.schema().base_schema.field(c).type
                   for c in right_cols}

    def tag(batch: pa.Table, side: int) -> pa.Table:
        n = batch.num_rows
        cols = {k: batch.column(k) for k in keys}
        for c in left_cols:
            cols[c] = (batch.column(c) if side == 0
                       else pa.nulls(n, type=left_types[c]))
        for c in right_cols:
            cols[c] = (batch.column(c) if side == 1
                       else pa.nulls(n, type=right_types[c]))
        cols["_r"] = pa.array(np.full(n, side, dtype=np.int8))
        if hot_ref is None:
            cols["_part"] = _partition_on_keys(batch, keys,
                                               num_partitions)
            return pa.table(cols)
        # skew-salted routing: one consistent u64 scheme for all rows
        import ray as _ray

        hot_arr = _ray.get(hot_ref)
        h = _keys_u64(batch, keys)
        hot = np.isin(h.view(np.int64), hot_arr)
        base = (h % np.uint64(num_partitions)).astype(np.int32)
        if side == 0:
            salt = np.arange(n, dtype=np.uint64) % np.uint64(salt_hot_keys)
            part = np.where(hot,
                            _salted_parts(h, salt, num_partitions),
                            base)
            cols["_part"] = pa.array(part.astype(np.int32))
            return pa.table(cols)
        t = pa.table(cols)
        pieces = [t.filter(pa.array(~hot)).append_column(
            "_part", pa.array(base[~hot]))]
        hot_idx = np.nonzero(hot)[0]
        if hot_idx.size:
            ht = t.take(pa.array(hot_idx))
            hh = h[hot_idx]
            m = hot_idx.size
            # one replica per DISTINCT partition a salt maps to — two
            # salts colliding mod num_partitions must not double the
            # row in that partition (it would duplicate every match)
            all_parts = np.stack([
                _salted_parts(hh, np.full(m, s, dtype=np.uint64),
                              num_partitions)
                for s in range(salt_hot_keys)])  # (S, m)
            pair = (np.tile(np.arange(m, dtype=np.int64),
                            salt_hot_keys)
                    * np.int64(num_partitions)
                    + all_parts.reshape(-1).astype(np.int64))
            uniq = np.unique(pair)
            ridx = uniq // num_partitions
            rpart = (uniq % num_partitions).astype(np.int32)
            pieces.append(ht.take(pa.array(ridx)).append_column(
                "_part", pa.array(rpart)))
        return pa.concat_tables(pieces)

    tagged = (left_ds.map_batches(lambda b: tag(b, 0),
                                  batch_format="pyarrow")
              .union(right_ds.map_batches(lambda b: tag(b, 1),
                                          batch_format="pyarrow")))

    out_cols = keys + left_cols + right_cols

    jt = {"inner": "inner", "left": "left outer",
          "right": "right outer", "full": "full outer"}[how]

    def join_partition(part: pa.Table) -> pa.Table:
        side = part.column("_r")
        lt = (part.filter(pc.equal(side, 0))
              .select(keys + left_cols))
        rt = (part.filter(pc.equal(side, 1))
              .select(keys + right_cols))
        keep_l = how in ("left", "full")
        keep_r = how in ("right", "full")
        if (lt.num_rows == 0 and not keep_r) or \
           (rt.num_rows == 0 and not keep_l):
            joined = pa.table(
                {c: pa.array([], type=(left_types.get(c) or
                                       right_types.get(c) or
                                       lt.schema.field(c).type))
                 for c in out_cols})
        elif rt.num_rows == 0:  # left/full outer, nothing to match
            for c in right_cols:
                lt = lt.append_column(
                    c, pa.nulls(lt.num_rows, type=right_types[c]))
            joined = lt.select(out_cols)
        elif lt.num_rows == 0:  # right/full outer, nothing to match
            for c in left_cols:
                rt = rt.append_column(
                    c, pa.nulls(rt.num_rows, type=left_types[c]))
            joined = rt.select(out_cols)
        else:
            joined = lt.join(rt, keys=keys, join_type=jt).select(out_cols)
        return post_join(joined) if post_join is not None else joined

    return (tagged.groupby("_part")
            .map_groups(join_partition, batch_format="pyarrow"))


# ------------------------------------------------- exact quantiles (int)

_NBUCKETS = 1 << 16


def _hist_pass(ds, col: str, spans: list[tuple[int, int]],
               group_col: str | None = None,
               group_vals: list | None = None):
    """One streaming pass computing a 64 Ki-bucket histogram for EVERY
    open bracket at once: each block emits one concatenated count
    vector (512 KiB per bracket), summed on the driver.  With
    ``group_col``, bracket ``i`` only counts rows whose group equals
    ``group_vals[i]`` (grouped quantiles share the same passes).
    Returns (per-bracket histograms, per-bracket bucket widths)."""
    widths = [max(1, math.ceil((hi - lo + 1) / _NBUCKETS))
              for lo, hi in spans]

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        g = (batch.column(group_col).to_numpy(zero_copy_only=False)
             if group_col else None)
        out = np.empty(_NBUCKETS * len(spans), dtype=np.int64)
        for si, ((lo, hi), width) in enumerate(zip(spans, widths)):
            mask = (v >= lo) & (v <= hi)
            if g is not None:
                mask &= g == group_vals[si]
            w = v[mask]
            b = (w - lo) // width
            out[si * _NBUCKETS:(si + 1) * _NBUCKETS] = \
                np.bincount(b, minlength=_NBUCKETS)
        return pa.table({"h": pa.array([out.tobytes()],
                                       type=pa.binary())})

    total = np.zeros(_NBUCKETS * len(spans), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for raw in pa.table(b).column("h").to_pylist():
            total += np.frombuffer(raw, dtype=np.int64)
    hists = [total[i * _NBUCKETS:(i + 1) * _NBUCKETS]
             for i in range(len(spans))]
    return hists, widths


def _kth_values(ds, col: str, ks, lo0: int, hi0: int) -> dict[int, int]:
    """Exact k-th-smallest values (1-indexed ranks) for every k in
    ``ks``, via the shared-pass histogram refinement.  All open
    brackets ride each streaming pass together."""
    results: dict[int, int] = {}
    # per-rank bracket (lo, hi, within-bracket rank)
    brackets = {k: (lo0, hi0, k) for k in set(ks)}
    while brackets:
        open_ks = list(brackets)
        spans = [(brackets[k][0], brackets[k][1]) for k in open_ks]
        hists, widths = _hist_pass(ds, col, spans)
        for k, hist, width in zip(open_ks, hists, widths):
            lo, hi, r = brackets[k]
            cum = np.cumsum(hist)
            b = int(np.searchsorted(cum, r))
            below = int(cum[b - 1]) if b > 0 else 0
            blo = lo + b * width
            bhi = min(hi, blo + width - 1)
            if width == 1:
                results[k] = blo
                del brackets[k]
            else:
                brackets[k] = (blo, bhi, r - below)
    return results


def exact_quantiles_int(ds, col: str, qs: list[float]) -> pa.Table:
    """Exact q-quantiles of an integer column, defined as the k-th
    smallest value with ``k = ceil(q * n)`` (so the DuckDB oracle is
    ``ORDER BY v LIMIT 1 OFFSET k-1``).

    Iterative histogram refinement: bound the domain with one min/max
    aggregate, then narrow every target's bracket simultaneously with
    64 Ki-bucket counting passes until each bucket width is 1.
    Integer domains up to 2^32 finish in ≤ 2 passes total (all open
    brackets share one pass); every pass streams.
    """
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(Min(col), Max(col), Count())
    lo0, hi0 = int(agg[f"min({col})"]), int(agg[f"max({col})"])
    n = int(agg["count()"])
    targets = {q: max(1, min(n, math.ceil(q * n))) for q in qs}
    results = _kth_values(ds, col, targets.values(), lo0, hi0)
    return pa.table({
        "q_bp": pa.array([int(round(q * 10000)) for q in qs],
                         type=pa.int64()),
        "k": pa.array([targets[q] for q in qs], type=pa.int64()),
        "value": pa.array([results[targets[q]] for q in qs],
                          type=pa.int64()),
    })


def quantile_cont_int(ds, col: str, qs: list[float]) -> pa.Table:
    """INTERPOLATED percentiles (SQL ``quantile_cont`` semantics) of an
    integer column: position ``p = q * (n - 1)`` (0-indexed), value =
    ``x[floor(p)] + (x[ceil(p)] - x[floor(p)]) * (p - floor(p))``.

    The two bracketing order statistics come from the same shared-pass
    histogram refinement as :func:`exact_quantiles_int` (one rank set,
    one pass group — never a sort).  Output is in micro-units
    (``round(value * 10000)``): with dyadic q (0.25, 0.5, 0.75) the
    interpolation is EXACT in float64 and the integer hash-matches
    DuckDB's ``round(quantile_cont(..) * 10000)`` bit-for-bit; avoid
    non-dyadic q if the oracle must hash-match."""
    from ray.data.aggregate import Count, Max, Min

    agg = ds.aggregate(Min(col), Max(col), Count())
    lo0, hi0 = int(agg[f"min({col})"]), int(agg[f"max({col})"])
    n = int(agg["count()"])
    pos = {q: q * (n - 1) for q in qs}
    ks = set()
    for p in pos.values():
        ks.add(int(math.floor(p)) + 1)
        ks.add(int(math.ceil(p)) + 1)
    vals = _kth_values(ds, col, ks, lo0, hi0)
    out = []
    for q in qs:
        p = pos[q]
        vlo = vals[int(math.floor(p)) + 1]
        vhi = vals[int(math.ceil(p)) + 1]
        frac = p - math.floor(p)
        interp = vlo + (vhi - vlo) * frac
        out.append(int(math.floor(interp * 10000 + 0.5)))
    return pa.table({
        "q_bp": pa.array([int(round(q * 10000)) for q in qs],
                         type=pa.int64()),
        "value_u": pa.array(out, type=pa.int64()),
    })


def grouped_mode_int(ds, group_col: str, col: str,
                     num_partitions: int = 32):
    """Per-group MODE of an integer column with the deterministic SQL
    tie-break (highest count, then smallest value — the
    ``row_number() OVER (ORDER BY cnt DESC, v ASC)`` convention).

    Decomposable: each block emits (group, value, count) partials via
    Arrow's vectorized group_by; ONE exchange on the group hash
    co-locates every partial of a group; the per-partition combine
    sums counts per (group, value) and takes the first row of each
    group run after a (group ASC, count DESC, value ASC) sort.  Only
    distinct (group, value) pairs ever cross the wire.  Returns
    Dataset[{group, mode, n}]."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group_col: batch.column(group_col),
                      col: batch.column(col)})
        g = t.group_by([group_col, col]).aggregate([([], "count_all")])
        return pa.table({group_col: g.column(group_col),
                         col: g.column(col),
                         "cnt": pc.cast(g.column("count_all"),
                                        pa.int64())})

    def combine(part: pa.Table) -> pa.Table:
        g = (part.group_by([group_col, col])
             .aggregate([("cnt", "sum")]))
        s = g.sort_by([(group_col, "ascending"),
                       ("cnt_sum", "descending"),
                       (col, "ascending")])
        groups = s.column(group_col).to_pylist()
        first_idx = [i for i, grp in enumerate(groups)
                     if i == 0 or grp != groups[i - 1]]
        t = s.take(pa.array(first_idx))
        return pa.table({group_col: t.column(group_col),
                         "mode": t.column(col),
                         "n": t.column("cnt_sum")})

    return coarse_partition_groups(
        ds.map_batches(partial, batch_format="pyarrow"),
        group_col, combine, num_partitions)


def exact_group_quantiles_int(ds, col: str, group_col: str,
                              qs: list[float]) -> pa.Table:
    """Exact per-GROUP q-quantiles of an integer column (k-th smallest
    within the group, k = ceil(q * n_group)) for a LOW-cardinality
    group column (order priorities, languages, statuses — the
    constraint is G × 512 KiB of histogram partial per block).

    Same iterative refinement as :func:`exact_quantiles_int`, with all
    open (group, q) brackets sharing every streaming pass — the pass
    count stays ≤ 2 for 32-bit domains regardless of G × |qs|."""

    def bounds(batch: pa.Table) -> pa.Table:
        t = (pa.table({group_col: batch.column(group_col),
                       col: batch.column(col)})
             .group_by(group_col)
             .aggregate([(col, "min"), (col, "max"), (col, "count")]))
        return pa.table({
            "g": t.column(group_col),
            "lo": t.column(f"{col}_min"),
            "hi": t.column(f"{col}_max"),
            "n": pc.cast(t.column(f"{col}_count"), pa.int64()),
        })

    parts = [pa.table(b) for b in
             ds.map_batches(bounds, batch_format="pyarrow")
             .iter_batches(batch_format="pyarrow")]
    stats = (pa.concat_tables(parts)
             .group_by("g")
             .aggregate([("lo", "min"), ("hi", "max"), ("n", "sum")]))
    gstats = {gv: (int(lo), int(hi), int(n)) for gv, lo, hi, n in zip(
        stats.column("g").to_pylist(), stats.column("lo_min").to_pylist(),
        stats.column("hi_max").to_pylist(),
        stats.column("n_sum").to_pylist())}

    # per (group, q) bracket: (lo, hi, within-bracket rank)
    brackets = {}
    targets = {}
    for gv, (lo, hi, n) in gstats.items():
        for q in qs:
            k = max(1, min(n, math.ceil(q * n)))
            targets[(gv, q)] = k
            brackets[(gv, q)] = (lo, hi, k)

    results = {}
    while brackets:
        keys = list(brackets)
        spans = [(brackets[kk][0], brackets[kk][1]) for kk in keys]
        gvals = [kk[0] for kk in keys]
        hists, widths = _hist_pass(ds, col, spans,
                                   group_col=group_col,
                                   group_vals=gvals)
        for kk, hist, width in zip(keys, hists, widths):
            lo, hi, k = brackets[kk]
            cum = np.cumsum(hist)
            b = int(np.searchsorted(cum, k))
            below = int(cum[b - 1]) if b > 0 else 0
            blo = lo + b * width
            bhi = min(hi, blo + width - 1)
            if width == 1:
                results[kk] = blo
                del brackets[kk]
            else:
                brackets[kk] = (blo, bhi, k - below)

    out_keys = sorted(results, key=lambda kk: (str(kk[0]), kk[1]))
    return pa.table({
        group_col: pa.array([kk[0] for kk in out_keys]),
        "q_bp": pa.array([int(round(kk[1] * 10000)) for kk in out_keys],
                         type=pa.int64()),
        "k": pa.array([targets[kk] for kk in out_keys], type=pa.int64()),
        "value": pa.array([results[kk] for kk in out_keys],
                          type=pa.int64()),
    })


def auto_join(left_ds, right_ds, key: str | list[str],
              left_cols: list[str],
              right_cols: list[str], how: str = "inner",
              broadcast_threshold: int = 1_000_000, **kw):
    """Join strategy picker: if the RIGHT side is small enough to ship
    whole (≤ ``broadcast_threshold`` rows), do a broadcast join — the
    right table is collected once, ``ray.put`` once, and every left
    batch joins against it locally with Arrow's hash join (zero
    shuffle).  Otherwise fall back to the one-exchange shuffle
    :func:`hash_join`.  Results are identical either way; only the
    topology differs.  The ``count()`` probe is a metadata-only pass
    for parquet sources.

    Shuffle-specific options (``post_join``, ``bloom_from``) force
    the shuffle path: ``post_join`` relies on partition co-location
    the broadcast path does not provide, so silently applying it per
    broadcast batch would change semantics with data size."""
    import ray as _ray

    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"unsupported join type: {how!r}")
    if how in ("right", "full"):
        # the broadcast path joins per LEFT batch, so it can never see
        # which broadcast-side rows went unmatched — right/full outer
        # always take the shuffle topology
        return hash_join(left_ds, right_ds, key, left_cols,
                         right_cols, how=how, **kw)
    if kw.get("post_join") is not None or kw.get("bloom_from") is not None:
        return hash_join(left_ds, right_ds, key, left_cols,
                         right_cols, how=how, **kw)

    n_right = right_ds.count()
    if n_right > broadcast_threshold:
        return hash_join(left_ds, right_ds, key, left_cols,
                         right_cols, how=how, **kw)

    keys = [key] if isinstance(key, str) else list(key)
    right_tbl = pa.concat_tables(
        [t for t in (_ray.get(r) for r in right_ds.to_arrow_refs())
         if t.num_rows > 0],
        promote_options="default") if n_right else None
    if right_tbl is not None:
        right_tbl = right_tbl.select(keys + right_cols)
    right_ref = _ray.put(right_tbl)
    right_types = {c: right_ds.schema().base_schema.field(c).type
                   for c in right_cols}
    out_cols = keys + left_cols + right_cols

    def bjoin(batch: pa.Table) -> pa.Table:
        rt = _ray.get(right_ref)
        lt = batch.select(keys + left_cols)
        if rt is None or rt.num_rows == 0:
            if how == "left":
                for c in right_cols:
                    lt = lt.append_column(
                        c, pa.nulls(lt.num_rows, type=right_types[c]))
                return lt.select(out_cols)
            return lt.slice(0, 0).join(
                pa.table({**{k: pa.array([], type=lt.schema.field(k).type)
                             for k in keys},
                          **{c: pa.array([], type=right_types[c])
                             for c in right_cols}}),
                keys=keys).select(out_cols)
        jt = "inner" if how == "inner" else "left outer"
        return lt.join(rt, keys=keys, join_type=jt).select(out_cols)

    return left_ds.map_batches(bjoin, batch_format="pyarrow")

# ------------------------------------- time-series joins (as-of / range)
#
# Ray Data has no merge-asof / interval join; these are the custom
# operators from the brief.  Both share one vectorized searchsorted
# kernel over flat numpy arrays and run in either of two topologies:
#
#   broadcast    — the anchor side is collected once, sorted, ray.put
#                  once, and every probe batch does the lookup locally
#                  (zero shuffle).  Right when anchors fit the object
#                  store.
#   partitioned  — BOTH sides are hash-partitioned on the key in ONE
#                  tagged-union exchange (the hash_join topology) and
#                  the same kernel runs per partition.  Right at scale:
#                  no side is ever materialized on the driver or
#                  shipped whole.
#
# ``mode=None`` picks by a count() probe of the anchor side, exactly
# like auto_join.  Results are identical either way (a key's probe and
# anchor rows always meet in one partition); a forced-path equality
# test pins that.


def _asof_state(akey: np.ndarray, atime: np.ndarray, aval: np.ndarray,
                direction: str = "backward"):
    """Sort anchors by (key, time, ±val) and build the dense-rank
    composite (key_rank * K + time_rank) that turns the two-level
    (key, time vs t) lookup into ONE searchsorted over int64 — exact
    (ranks are small ints, no float composite).

    backward: within equal (key, time) the LAST row in sort order has
    the SMALLEST val, so the probe's side="right" - 1 lands on
    min(val) — SQL's ``min(id) ... where time = max(time)`` tiebreak.
    forward: ascending val, so the probe's side="left" lands on
    min(val) among the SMALLEST time at-or-after t."""
    order = np.lexsort((-aval if direction == "backward" else aval,
                        atime, akey))
    akey, atime, aval = akey[order], atime[order], aval[order]
    ukey = np.unique(akey)
    utime = np.unique(atime)
    comp = (np.searchsorted(ukey, akey).astype(np.int64)
            * np.int64(len(utime) + 2)
            + np.searchsorted(utime, atime).astype(np.int64))
    return akey, aval, ukey, utime, comp


def _asof_probe(state, pkey: np.ndarray, ptime: np.ndarray,
                direction: str = "backward",
                tolerance: int | None = None):
    """Vectorized as-of lookup.  Returns (matched mask, clipped anchor
    index) — ``aval[idx[mask]]`` is the result.  ``tolerance`` bounds
    the match's time distance: |anchor_time - probe_time| must be
    ≤ tolerance (pandas merge_asof semantics)."""
    akey, aval, ukey, utime, comp = state
    lo = np.searchsorted(akey, pkey, side="left")
    hi = np.searchsorted(akey, pkey, side="right")
    r = np.searchsorted(ukey, pkey).clip(0, len(ukey) - 1)
    K = np.int64(len(utime) + 2)
    if direction == "backward":
        dr = np.searchsorted(utime, ptime, side="right") - 1
        idx = np.searchsorted(comp, r.astype(np.int64) * K + dr,
                              side="right") - 1
        # idx falls into the previous key's span when this key has no
        # anchor at-or-before ptime — the (idx >= lo) guard rejects it
        mask = (hi > lo) & (idx >= lo)
    else:
        dr = np.searchsorted(utime, ptime, side="left")
        idx = np.searchsorted(comp, r.astype(np.int64) * K + dr,
                              side="left")
        # idx lands at hi when this key has no anchor at-or-after
        # ptime — the (idx < hi) guard rejects it
        mask = (hi > lo) & (idx < hi) & (idx >= lo)
    idx = np.clip(idx, 0, len(aval) - 1)
    if tolerance is not None and len(utime):
        # recover the matched anchor's time from its dense rank — the
        # composite's low digits — and bound the distance
        atime = utime[np.clip(comp[idx] % K, 0, len(utime) - 1)]
        mask = mask & (np.abs(atime - ptime) <= tolerance)
    return mask, idx


def _i64(col) -> np.ndarray:
    return col.to_numpy(zero_copy_only=False).astype("int64")


def _key_arr(col) -> np.ndarray:
    """Join-key column → numpy array the searchsorted kernels can
    order: integral/temporal keys become int64; string/binary keys
    stay object arrays (numpy's comparison sorts handle them — slower
    per element but the same algorithm)."""
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind in ("i", "u", "M", "m", "f"):
        return arr.astype("int64")
    return arr


def merge_asof(probe_ds, anchor_ds, *, probe_key: str, probe_time: str,
               probe_out: str, anchor_key: str, anchor_time: str,
               anchor_val: str, broadcast_threshold: int = 1_000_000,
               num_partitions: int = 64, mode: str | None = None,
               direction: str = "backward",
               tolerance: int | None = None):
    """As-of inner join: each probe row is matched to the anchor row
    of the same key with the LARGEST time at-or-before the probe time
    (``direction="backward"``, default) or the SMALLEST time
    at-or-after it (``"forward"``) — ties: smallest ``anchor_val``.
    ``tolerance`` (int64 time units) drops matches farther than that
    from the probe time, pandas-style.  Output columns
    ``(probe_out, anchor_val)``.  Keys may be integral OR
    string/binary (string keys ride the object-array comparison
    kernels); values must be integral; times may be integral or
    timestamp (compared as int64 epoch us).

    Topology picked by an anchor-side count() probe (see section
    comment); ``mode`` forces ``"broadcast"`` or ``"partitioned"``."""
    import ray as _ray

    if mode not in (None, "broadcast", "partitioned"):
        raise ValueError(f"bad mode: {mode!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction: {direction!r}")
    out_type = probe_ds.schema().base_schema.field(probe_out).type
    val_type = anchor_ds.schema().base_schema.field(anchor_val).type

    def _empty() -> pa.Table:
        return pa.table({probe_out: pa.array([], type=out_type),
                         anchor_val: pa.array([], type=val_type)})

    if mode is None:
        mode = ("broadcast"
                if anchor_ds.count() <= broadcast_threshold
                else "partitioned")

    if mode == "broadcast":
        tbls = [t for t in (_ray.get(r)
                            for r in anchor_ds.to_arrow_refs())
                if t.num_rows]
        if not tbls:
            return probe_ds.map_batches(lambda b: _empty(),
                                        batch_format="pyarrow")
        an = pa.concat_tables(tbls, promote_options="default")
        state_ref = _ray.put(_asof_state(
            _key_arr(an.column(anchor_key)), _i64(an.column(anchor_time)),
            _i64(an.column(anchor_val)), direction))

        def bprobe(batch: pa.Table) -> pa.Table:
            state = _ray.get(state_ref)
            mask, idx = _asof_probe(state,
                                    _key_arr(batch.column(probe_key)),
                                    _i64(batch.column(probe_time)),
                                    direction, tolerance)
            return pa.table({
                probe_out: batch.column(probe_out).filter(pa.array(mask)),
                anchor_val: pa.array(state[1][idx[mask]], type=val_type)})

        return probe_ds.map_batches(bprobe, batch_format="pyarrow")

    # partitioned: one tagged-union exchange on the key, kernel per
    # partition — no driver materialization of either side
    key_type = probe_ds.schema().base_schema.field(probe_key).type

    def tag_probe(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column(probe_key), key_type)
        return pa.table({
            "_k": k,
            "_t": pa.array(_i64(b.column(probe_time))),
            "_o": b.column(probe_out),
            "_v": pa.nulls(b.num_rows, type=pa.int64()),
            "_r": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "_part": _partition_on_keys(pa.table({"_k": k}),
                                        ["_k"], num_partitions)})

    def tag_anchor(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column(anchor_key), key_type)
        return pa.table({
            "_k": k,
            "_t": pa.array(_i64(b.column(anchor_time))),
            "_o": pa.nulls(b.num_rows, type=out_type),
            "_v": pa.array(_i64(b.column(anchor_val))),
            "_r": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "_part": _partition_on_keys(pa.table({"_k": k}),
                                        ["_k"], num_partitions)})

    tagged = (probe_ds.map_batches(tag_probe, batch_format="pyarrow")
              .union(anchor_ds.map_batches(tag_anchor,
                                           batch_format="pyarrow")))

    def join_partition(part: pa.Table) -> pa.Table:
        side = part.column("_r")
        pr = part.filter(pc.equal(side, 0))
        an = part.filter(pc.equal(side, 1))
        if pr.num_rows == 0 or an.num_rows == 0:
            return _empty()
        state = _asof_state(_key_arr(an.column("_k")),
                            _i64(an.column("_t")),
                            _i64(an.column("_v")), direction)
        mask, idx = _asof_probe(state, _key_arr(pr.column("_k")),
                                _i64(pr.column("_t")), direction,
                                tolerance)
        return pa.table({
            probe_out: pr.column("_o").filter(pa.array(mask)),
            anchor_val: pa.array(state[1][idx[mask]], type=val_type)})

    return (tagged.groupby("_part")
            .map_groups(join_partition, batch_format="pyarrow"))


def _range_state(akey: np.ndarray, atime: np.ndarray, aid: np.ndarray):
    """Sort anchors by (key, time, id) and build the same dense-rank
    composite; probe batches locate each row's qualifying anchor
    window with TWO searchsorteds."""
    order = np.lexsort((aid, atime, akey))
    akey, atime, aid = akey[order], atime[order], aid[order]
    ukey = np.unique(akey)
    utime = np.unique(atime)
    comp = (np.searchsorted(ukey, akey).astype(np.int64)
            * np.int64(len(utime) + 2)
            + np.searchsorted(utime, atime).astype(np.int64))
    return aid, ukey, utime, comp


def _range_probe_counts(state, pkey: np.ndarray, ptime: np.ndarray,
                        window: int) -> np.ndarray:
    """Per-anchor counts of probe rows with anchor_time in
    [ptime - window, ptime) — i.e. probe strictly after the anchor and
    within ``window`` — via a diff-array + cumsum: ZERO pair
    materialization."""
    aid, ukey, utime, comp = state
    K = np.int64(len(utime) + 2)
    r = np.searchsorted(ukey, pkey).clip(0, len(ukey) - 1)
    present = ukey[r] == pkey
    dr_lo = np.searchsorted(utime, ptime - window, side="left")
    dr_hi = np.searchsorted(utime, ptime, side="left")
    lo = np.searchsorted(comp, r * K + dr_lo, side="left")[present]
    hi = np.searchsorted(comp, r * K + dr_hi, side="left")[present]
    delta = np.zeros(len(aid) + 1, dtype=np.int64)
    np.add.at(delta, lo, 1)
    np.add.at(delta, hi, -1)
    return np.cumsum(delta[:-1])


def range_follow_counts(probe_ds, anchor_ds, *, probe_key: str,
                        probe_time: str, anchor_key: str,
                        anchor_time: str, anchor_id: str, window: int,
                        out_id: str, out_count: str = "n_follow",
                        broadcast_threshold: int = 1_000_000,
                        num_partitions: int = 64,
                        mode: str | None = None):
    """Range (interval) join with count aggregation: for every anchor
    row, the number of probe rows of the SAME key with time in
    (anchor_time, anchor_time + window].  Anchors with zero followers
    are omitted (inner-join GROUP BY semantics).  Output columns
    ``(out_id, out_count)``."""
    import ray as _ray

    if mode not in (None, "broadcast", "partitioned"):
        raise ValueError(f"bad mode: {mode!r}")
    id_type = anchor_ds.schema().base_schema.field(anchor_id).type
    window = np.int64(window)

    def _empty() -> pa.Table:
        return pa.table({out_id: pa.array([], type=id_type),
                         out_count: pa.array([], type=pa.int64())})

    if mode is None:
        mode = ("broadcast"
                if anchor_ds.count() <= broadcast_threshold
                else "partitioned")

    if mode == "broadcast":
        tbls = [t for t in (_ray.get(r)
                            for r in anchor_ds.to_arrow_refs())
                if t.num_rows]
        if not tbls:
            return probe_ds.map_batches(lambda b: _empty(),
                                        batch_format="pyarrow")
        an = pa.concat_tables(tbls, promote_options="default")
        state_ref = _ray.put(_range_state(
            _key_arr(an.column(anchor_key)), _i64(an.column(anchor_time)),
            _i64(an.column(anchor_id))))

        def partial(batch: pa.Table) -> pa.Table:
            state = _ray.get(state_ref)
            if batch.num_rows == 0:
                return _empty()
            counts = _range_probe_counts(
                state, _key_arr(batch.column(probe_key)),
                _i64(batch.column(probe_time)), window)
            nz = np.flatnonzero(counts)
            if len(nz) == 0:
                return _empty()
            return pa.table({
                out_id: pa.array(state[0][nz], type=id_type),
                out_count: pa.array(counts[nz], type=pa.int64())})

        parts = probe_ds.map_batches(partial, batch_format="pyarrow")
        # different probe batches hit the same anchor: tiny final sum
        g = parts.groupby(out_id).sum(out_count)
        return g.map_batches(
            lambda b: pa.table({
                out_id: b.column(out_id),
                out_count: b.column(f"sum({out_count})")}),
            batch_format="pyarrow")

    key_type = probe_ds.schema().base_schema.field(probe_key).type

    def tag_probe(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column(probe_key), key_type)
        return pa.table({
            "_k": k,
            "_t": pa.array(_i64(b.column(probe_time))),
            "_i": pa.nulls(b.num_rows, type=id_type),
            "_r": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
            "_part": _partition_on_keys(pa.table({"_k": k}),
                                        ["_k"], num_partitions)})

    def tag_anchor(b: pa.Table) -> pa.Table:
        k = pc.cast(b.column(anchor_key), key_type)
        return pa.table({
            "_k": k,
            "_t": pa.array(_i64(b.column(anchor_time))),
            "_i": b.column(anchor_id),
            "_r": pa.array(np.ones(b.num_rows, dtype=np.int8)),
            "_part": _partition_on_keys(pa.table({"_k": k}),
                                        ["_k"], num_partitions)})

    tagged = (probe_ds.map_batches(tag_probe, batch_format="pyarrow")
              .union(anchor_ds.map_batches(tag_anchor,
                                           batch_format="pyarrow")))

    def join_partition(part: pa.Table) -> pa.Table:
        side = part.column("_r")
        pr = part.filter(pc.equal(side, 0))
        an = part.filter(pc.equal(side, 1))
        if pr.num_rows == 0 or an.num_rows == 0:
            return _empty()
        state = _range_state(_key_arr(an.column("_k")),
                             _i64(an.column("_t")),
                             _i64(an.column("_i")))
        counts = _range_probe_counts(state, _key_arr(pr.column("_k")),
                                     _i64(pr.column("_t")), window)
        nz = np.flatnonzero(counts)
        if len(nz) == 0:
            return _empty()
        # a key lives wholly in one partition, so these counts are
        # FINAL — no cross-partition combine needed
        return pa.table({
            out_id: pa.array(state[0][nz], type=id_type),
            out_count: pa.array(counts[nz], type=pa.int64())})

    return (tagged.groupby("_part")
            .map_groups(join_partition, batch_format="pyarrow"))
