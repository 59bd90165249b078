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
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    out_id, out_vec, out_lb = [], [], []
    for r in range(n):
        for vid, v, lb in zip(vec_ids, vecs, labels):
            if r:
                d = len(v)
                k = r % d
                # rotation preserves the norm and the component value
                # distribution; the perturbation breaks exact ties
                v = [
                    v[(j + k) % d] + ((r * 13 + j * 5) % 7 - 3) * 1e-3
                    for j in range(d)
                ]
            out_id.append(vid + r * STRIDES["vec_id"])
            out_vec.append(v)
            out_lb.append(lb)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out_id, pa.int64()),
                "embedding": pa.array(out_vec, pa.list_(pa.float32())),
                "label": pa.array(out_lb, pa.int32()),
            }
        ),
        os.path.join(dest, "embeddings.parquet"),
    )


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
    print(
        f"sanity ok: max cross-replica j3 {worst:.3f}; "
        f"exact-dup surplus {surplus[0]}/replica (constant)"
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
