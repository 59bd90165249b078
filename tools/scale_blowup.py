#!/usr/bin/env python3
"""Synthesize a one-decade blow-up of a fixture dir (default: sf0.1 ->
~sf1) for the scaling sweep — r9 VERDICT item 1: everything above
sf0.1 was extrapolation until now.

Design (the point is to preserve WORKLOAD SHAPE, not just row counts):

- Fact tables (customer/orders/lineitem/events/documents/embeddings)
  are replicated REPLICAS times with per-replica key offsets on their
  primary keys and on every FK that points at another scaled table, so
  join fan-in/fan-out per key stays constant while table sizes grow
  10x (key-cardinality ratios preserved). FKs into the fixed dimension
  tables (nation/region/part/supplier) are left alone — per-dim fan-out
  grows 10x, which is exactly what a bigger corpus does to a fixed
  dimension.
- events keeps its time range (a 10x corpus over the same window is a
  10x-denser timeline) and offsets user_id, so per-user event density —
  the thing that sizes session/stateful-streaming state — is unchanged.
- documents text is RE-SALTED per replica (deterministic context-keyed
  word substitution, ~1/2 of tokens): within a replica the corpus keeps
  the original's exact/near-dup structure, while cross-replica shingle
  Jaccard drops far below dedup thresholds (_sanity pins < 0.35). Plain replication would
  put every doc in a 10-clique and quadratically inflate every
  pair-emitting dedup operator — a workload NO real 10x corpus has
  (dup RATES stay constant at scale, cluster sizes don't multiply).
  Replica 0 is byte-identical to the source, so `doc_id < N` pinned
  queries see the original rows.
- embeddings rotate their components by the replica index (norm- and
  distribution-preserving) plus a tiny deterministic perturbation, so
  ANN/semantic-dedup cell occupancy scales like a real corpus instead
  of 10 exact copies per vector.

Deterministic (pure arithmetic, no RNG). Writes one parquet FILE per
table (raw-fixture layout) to the dest dir.

Usage: python tools/scale_blowup.py [src_dir] [dest_dir] [replicas]
       (defaults /root/testdata/sf0.1 /root/repo/.scale/sf1 10)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

REPLICAS = 10

# stride = round power of ten above the source key max, so replica keys
# never collide and stay human-attributable (replica = key // stride)
STRIDES = {
    "c_custkey": 100_000,
    "o_orderkey": 1_000_000,
    "event_id": 1_000_000,
    "user_id": 100_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
}

COPY_TABLES = ("region", "nation", "part", "supplier")


def _copy_sql(con: duckdb.DuckDBPyConnection, src: str, dest: str, n: int) -> None:
    """The SQL-expressible replications (everything but documents and
    embeddings) in one duckdb pass per table."""
    rng = f"(SELECT unnest(range({n})) AS r)"
    plans = {
        "customer": f"""
            SELECT c_custkey + r * {STRIDES['c_custkey']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM read_parquet('{src}/customer.parquet'), {rng}""",
        "orders": f"""
            SELECT o_orderkey + r * {STRIDES['o_orderkey']} AS o_orderkey,
                   o_custkey + r * {STRIDES['c_custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM read_parquet('{src}/orders.parquet'), {rng}""",
        "lineitem": f"""
            SELECT l_orderkey + r * {STRIDES['o_orderkey']} AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM read_parquet('{src}/lineitem.parquet'), {rng}""",
        "events": f"""
            SELECT event_id + r * {STRIDES['event_id']} AS event_id, ts,
                   user_id + r * {STRIDES['user_id']} AS user_id,
                   event_type, value, props
            FROM read_parquet('{src}/events.parquet'), {rng}""",
    }
    for t in COPY_TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{dest}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, sql in plans.items():
        con.execute(f"COPY ({sql}) TO '{dest}/{t}.parquet' (FORMAT PARQUET)")


def _salt_text(text: str, r: int, cache: dict) -> str:
    """Deterministic per-replica substitution of ~1/2 of tokens, keyed
    on (prev word, word, replica). Content-keyed, not position-keyed,
    so the mapping commutes with edits: within a replica, exact dups
    stay exact and near-dup shingle similarity is essentially preserved
    (an edit damages only the one decision whose context it changed),
    while a cross-replica 3-gram survives only if all three tokens'
    contexts are substituted in NEITHER replica (~(1/4)^3 ≈ 0.016 of
    windows -> Jaccard well under every near-dup threshold in the
    engine; _sanity pins the measured worst < 0.35)."""
    if r == 0:
        return text

    import zlib

    def sub(prev: str, word: str) -> str:
        # keyed on the BIGRAM CONTEXT (prev word + word), hashed
        # together with the replica:
        # - an affine-in-r form made the substitution class cycle
        #   mod 3, so replicas ≡ (mod 3) shared substitution sets
        #   (measured worst cross-replica j3 0.43);
        # - per-word-TYPE keying has huge per-doc variance on this
        #   corpus's ~30-type vocabulary (measured worst 0.60);
        # context keying gives ~|doc| independent decisions per doc
        # while an edit in a near-dup damages only the one decision
        # whose context it changed. _sanity pins the result.
        key = (prev, word)
        got = cache.get(key)
        if got is None:
            h = zlib.crc32(
                b"%d|%s|%s" % (r, prev.encode(), word.encode())
            ) & 0xFFFFFFFF
            got = word if h % 2 else f"w{h % 9973}q"
            cache[key] = got
        return got

    words = text.split(" ")
    return " ".join(
        sub(words[i - 1] if i else "", w) for i, w in enumerate(words)
    )


def _blow_documents(src: str, dest: str, n: int) -> None:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    out_id, out_text, out_lang, out_src, out_n = [], [], [], [], []
    for r in range(n):
        cache: dict = {}
        for did, tx, lg, so in zip(doc_ids, texts, langs, sources):
            s = _salt_text(tx, r, cache)
            out_id.append(did + r * STRIDES["doc_id"])
            out_text.append(s)
            out_lang.append(lg)
            out_src.append(so)
            out_n.append(len(s))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
                "source": pa.array(out_src, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
            }
        ),
        os.path.join(dest, "documents.parquet"),
    )


def _blow_embeddings(src: str, dest: str, n: int) -> None:
    """Replicas are cyclic shifts WITH a per-(replica, component) sign
    pattern. The shift preserves the norm and the component value
    multiset; the SIGN pattern is what keeps cross-replica cosines low
    (r11 fix, third-decade finding): shift alone repeats every d
    replicas, so at n > d every shift class held ~n/d copies differing
    only by the tiny tie-breaker perturbation — cosine ~1.0 cliques
    that inflated q_dedup_embed's sf100 survivor set to ~127M pairs, a
    near-dup workload no real 1000x corpus has (and the exact failure
    class the document re-salt exists to prevent; embeddings simply
    had no equivalent until now). The sign comes from a multiply-xor-
    multiply avalanche hash of (replica, component) — deterministic,
    no RNG state; a plain linear-form parity is NOT enough (bit b of
    r*C repeats every 2^(b+1) replicas, quietly recreating the cliques
    at replica distance 256). Expected same-shift-class cosine ~0 with
    ~1/sqrt(d) tails; the `_sanity` cosine pin measures it."""
    import numpy as np

    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    base_ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    X = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    base_lb = np.asarray(t.column("label").to_pylist(), dtype=np.int32)
    m, d = X.shape
    # int32 list offsets wrap SILENTLY in np.arange past 2^31 and
    # pa.ListArray.from_arrays does not validate monotonicity — fail
    # loudly BEFORE the replication loop allocates ~8 GB of values
    # (r11 review catch; the cliff is n ≈ 16,800 replicas of the
    # 2,000-row sf0.1 base), and as a real raise, not an assert
    # `python -O` would strip.
    if (n * m + 1) * d >= 2**31:
        raise ValueError(
            f"embedding blow-up needs {n * m * d} list values — past "
            "int32 offset range; chunk the table or switch to large_list"
        )
    out_id, out_vals, out_lb = [], [], []
    for r in range(n):
        if r == 0:
            Vr = X
        else:
            k = r % d
            # position j takes v[(j + k) % d], i.e. a left roll by k
            Vr = np.roll(X, -k, axis=1)
            Vr = _replica_signs(r, d) * Vr + (
                ((r * 13 + np.arange(d) * 5) % 7 - 3) * 1e-3
            )
        out_id.append(base_ids + r * STRIDES["vec_id"])
        out_vals.append(Vr.astype(np.float32).ravel())
        out_lb.append(base_lb)
    vals = pa.array(np.concatenate(out_vals), pa.float32())
    offsets = pa.array(
        np.arange(0, (n * m + 1) * d, d, dtype=np.int32), pa.int32()
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "embedding": pa.ListArray.from_arrays(offsets, vals),
                "label": pa.array(np.concatenate(out_lb), pa.int32()),
            }
        ),
        os.path.join(dest, "embeddings.parquet"),
    )


def _replica_signs(r: int, d: int):
    """±1.0 signs for replica ``r``'s components: avalanche-mixed
    64-bit hash of (r, j), bit 32. Distinct replicas get effectively
    independent patterns (no linear-form periodicity)."""
    import numpy as np

    j = np.arange(d, dtype=np.uint64)
    h = np.uint64(r * 2654435761 % (1 << 64)) ^ (
        j * np.uint64(0x9E3779B97F4A7C15) + np.uint64(0xD1B54A32D192ED03)
    )
    h = (h ^ (h >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> np.uint64(33))
    return 1.0 - 2.0 * ((h >> np.uint64(32)) & np.uint64(1)).astype(np.float64)


def _sanity(dest: str, n: int) -> None:
    """Pin the salting invariants that make the blow-up a fair
    workload: cross-replica shingle similarity below near-dup
    thresholds, and per-replica exact-dup surplus identical to the
    source's (dup RATE constant — no synthetic 10-cliques).

    The j3 pin samples a FIXED number of replicas (≤99, evenly spaced)
    at any n — the pin is a dup-RATE statistic, and the max over a
    sample that GROWS with n is not one: the per-pair j3 distribution
    is unchanged by n (each replica's substitutions are independent
    coin flips per bigram context), but the max of 50·(n−1) draws
    creeps up its tail by plain extreme-value statistics — measured
    0.273 at n=100 (r10) and 0.379 at n=1000 (r11, one doc pair out of
    ~50k sampled) on identically-distributed data. A fixed sample pins
    the same statistic at every scale; a systematic defect (the mod-3
    cycling class this check exists for) still fails it loudly since
    every sampled replica participates."""
    import hashlib

    t = pq.read_table(
        os.path.join(dest, "documents.parquet"), columns=["doc_id", "text"]
    )
    by_id = dict(zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()))
    stride = STRIDES["doc_id"]

    def sh3(s: str) -> set:
        w = s.split(" ")
        return {tuple(w[i : i + 3]) for i in range(max(0, len(w) - 2))}

    base_ids = sorted(i for i in by_id if i < stride)[:50]
    if n <= 100:
        rs = list(range(1, n))
    else:
        rs = sorted({max(1, round(i * (n - 1) / 99)) for i in range(1, 100)})
    worst = 0.0
    for r in rs:
        for b in base_ids:
            a, c = sh3(by_id[b]), sh3(by_id[b + r * stride])
            if a | c:
                worst = max(worst, len(a & c) / len(a | c))
    assert worst < 0.35, f"cross-replica j3 too high: {worst:.3f}"
    surplus = []
    for r in range(n):
        hs = [
            hashlib.md5(by_id[i].encode()).hexdigest()
            for i in by_id
            if r * stride <= i < (r + 1) * stride
        ]
        surplus.append(len(hs) - len(set(hs)))
    assert len(set(surplus)) == 1, f"dup surplus varies by replica: {surplus}"

    # Embedding cross-replica cosine pin (r11, added with the sign-
    # pattern fix): same fixed-sample discipline as the j3 pin — 50
    # base vectors x (<=99 sampled replicas + base), PAIRWISE max
    # cosine within each base's replica family. Pairwise matters: the
    # defect this exists for (shift-class cliques at n > d) pairs
    # replicas with EACH OTHER, not with the base. 0.9 sits between
    # honest cross-replica tails (~0.5 at d=64) and the 0.95 near-dup
    # threshold the dedup workloads probe.
    import numpy as np

    vstride = STRIDES["vec_id"]
    ers = ([0] + rs) if n > 1 else [0]
    # read ONLY the sampled families (50 bases x <=100 replicas) — the
    # full blown table is ~2M x 64 doubles at n=1000, multi-GB as
    # Python lists, to feed a 5,050-row check (r11 review catch)
    ebt = pq.read_table(
        os.path.join(dest, "embeddings.parquet"), columns=["vec_id"]
    )
    all_ids = np.asarray(ebt.column("vec_id").to_pylist(), dtype=np.int64)
    ebase = np.sort(all_ids[all_ids < vstride])[:50]
    want = {int(b) + r * vstride for b in ebase for r in ers}
    et = pq.read_table(
        os.path.join(dest, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "in", sorted(want))],
    )
    eids = np.asarray(et.column("vec_id").to_pylist(), dtype=np.int64)
    evecs = np.asarray(et.column("embedding").to_pylist(), dtype=np.float64)
    by_vid = {int(i): v for i, v in zip(eids, evecs)}
    worst_cos = 0.0
    for b in ebase:
        fam = np.stack([by_vid[int(b) + r * vstride] for r in ers])
        fam = fam / np.linalg.norm(fam, axis=1, keepdims=True)
        G = fam @ fam.T
        np.fill_diagonal(G, 0.0)
        worst_cos = max(worst_cos, float(np.abs(G).max()))
    assert worst_cos < 0.9, f"cross-replica cosine too high: {worst_cos:.3f}"
    print(
        f"sanity ok: max cross-replica j3 {worst:.3f}; "
        f"exact-dup surplus {surplus[0]}/replica (constant); "
        f"max cross-replica |cosine| {worst_cos:.3f}"
    )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else REPLICAS
    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    _copy_sql(con, src, dest, n)
    _blow_documents(src, dest, n)
    _blow_embeddings(src, dest, n)
    for t in (
        "customer orders lineitem events documents embeddings "
        "region nation part supplier"
    ).split():
        c = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t:12s} {c:>10,}")
    _sanity(dest, n)
    print(f"wrote {dest} (x{n})")


if __name__ == "__main__":
    main()
