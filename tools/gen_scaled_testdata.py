"""Distribution-matched synthetic data generator for SCALE measurement.

The driver ships sf0.001/0.01/0.1 (TESTDATA.md, read-only). SCALE.md's
100x arguments deserve at least one MEASURED 10x step, so this tool
generates an sfN directory whose per-row statistics match sf0.1 —
vocabulary, document length distribution, exact-dup rate, embedding
cluster structure (per-label mean/std), part name/brand/type patterns —
at `--mult` times the row counts. Deterministic (numpy PCG64, fixed
seed): two runs produce identical bytes.

It deliberately does NOT replicate sf0.1 rows verbatim: copying each
text/vector 10x would multiply every duplicate CLUSTER by 10 and inflate
the quadratic terms of dedup candidate generation ~100x — measuring that
would conflate data-shape change with operator scaling. Fresh draws from
the same distributions keep cluster densities comparable, which is the
property near-linear scaling claims are about.

Only the tables the expensive-query set reads are generated:
documents, embeddings, part.

Usage: python tools/gen_scaled_testdata.py --out /tmp/sf1 --mult 10
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 20260814


def _read(name: str) -> pa.Table:
    return pq.read_table(f"{SRC}/{name}.parquet")


def gen_documents(rng: np.random.Generator, mult: int) -> pa.Table:
    t = _read("documents")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    vocab = sorted({w for s in texts for w in s.split()})
    wc = np.array([len(s.split()) for s in texts])
    n = len(texts) * mult
    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    n_sources = len(set(t.column("source").to_pylist()))

    counts = rng.choice(wc, size=n)                      # empirical lengths
    words = rng.integers(0, len(vocab), size=int(counts.sum()))
    offs = np.concatenate(([0], np.cumsum(counts)))
    out_texts = [
        " ".join(vocab[w] for w in words[offs[i]:offs[i + 1]]) for i in range(n)
    ]
    # exact-dup rate parity: sf0.1 has 8 texts duplicated once per 5000
    n_dups = (8 * n) // len(texts)
    dup_src = rng.choice(n, size=n_dups * 2, replace=False)
    for a, b in zip(dup_src[:n_dups], dup_src[n_dups:]):
        out_texts[b] = out_texts[a]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(out_texts),
            "lang": pa.array(rng.choice(lang_vals, size=n, p=lang_p)),
            "source": pa.array([f"src{i % n_sources}" for i in rng.integers(0, n_sources, size=n)]),
            "n_chars": pa.array([len(s) for s in out_texts], pa.int64()),
        }
    )


def gen_embeddings(rng: np.random.Generator, mult: int) -> pa.Table:
    t = _read("embeddings")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    labels = np.array(t.column("label").to_pylist())
    n = emb.shape[0] * mult
    uniq = np.unique(labels)
    per = n // len(uniq)
    vecs, labs = [], []
    for lb in uniq:
        sub = emb[labels == lb]
        mean, std = sub.mean(axis=0), sub.std(axis=0)
        vecs.append(mean + rng.standard_normal((per, emb.shape[1])) * std)
        labs.append(np.full(per, lb))
    v = np.concatenate(vecs).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(v.shape[0]), pa.int64()),
            "embedding": pa.array(v.tolist(), pa.list_(pa.float32())),
            "label": pa.array(np.concatenate(labs).astype(np.int32), pa.int32()),
        }
    )


def gen_part(rng: np.random.Generator, mult: int) -> pa.Table:
    t = _read("part")
    names = t.column("p_name").to_pylist()
    adjs = sorted({s.split()[0] for s in names})
    nouns = sorted({s.split()[1] for s in names})
    types = sorted(set(t.column("p_type").to_pylist()))
    n_brands = len(set(t.column("p_brand").to_pylist()))
    n = len(names) * mult
    return pa.table(
        {
            "p_partkey": pa.array(range(n), pa.int64()),
            "p_name": pa.array(
                [f"{adjs[a]} {nouns[b]}" for a, b in zip(
                    rng.integers(0, len(adjs), n), rng.integers(0, len(nouns), n))]
            ),
            "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(0, n_brands, n)]),
            "p_type": pa.array([types[i] for i in rng.integers(0, len(types), n)]),
            "p_size": pa.array(rng.integers(1, 51, n).astype(np.int32), pa.int32()),
            "p_retailprice": pa.array(900.0 + 0.1 * np.arange(n, dtype=np.float64)),
        }
    )


def gen_events(rng: np.random.Generator, mult: int) -> pa.Table:
    """mult× events over the SAME time window (10× data in a period means
    10× temporal density — the property the nearest-event/sessionize work
    scales with). Empirical draws: per-user event-count skew is preserved
    by sampling original user ids and striping them across mult id blocks;
    types/values resample the source distributions. The ts column keeps
    the source's physical parquet type so the engine's `_t()` read path
    behaves identically."""
    t = _read("events")
    src_users = t.column("user_id").to_numpy()
    src_types = t.column("event_type").to_pylist()
    src_vals = t.column("value").to_numpy()
    ts_col = t.column("ts")
    # draw in the SOURCE's physical unit (int64 view of the timestamp)
    ts_int = ts_col.cast(pa.int64()).to_numpy()
    n_users = int(src_users.max()) + 1
    n = len(src_users) * mult
    ts = np.sort(
        rng.integers(int(ts_int.min()), int(ts_int.max()) + 1, size=n)
    )
    users = (
        src_users[rng.integers(0, len(src_users), size=n)]
        + rng.integers(0, mult, size=n) * n_users
    )
    tvals, tcnt = np.unique(src_types, return_counts=True)
    types = rng.choice(tvals, size=n, p=tcnt / tcnt.sum())
    vals = src_vals[rng.integers(0, len(src_vals), size=n)]
    ks = rng.integers(0, 100, size=n)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.int64()).cast(ts_col.type),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(np.round(vals, 2), pa.float64()),
            "props": pa.array([f'{{"k": {k}}}' for k in ks]),
        }
    )


def gen_orders(rng: np.random.Generator, mult: int) -> pa.Table:
    """mult× orders: per-customer order-count skew preserved by striping
    sampled custkeys across mult id blocks; status/priority/price resample
    the source distributions; dates uniform over the source window in the
    source's physical unit."""
    t = _read("orders")
    cust = t.column("o_custkey").to_numpy()
    n_cust = int(cust.max()) + 1
    status = t.column("o_orderstatus").to_pylist()
    prio = t.column("o_orderpriority").to_pylist()
    price = t.column("o_totalprice").to_numpy()
    d_col = t.column("o_orderdate")
    d_int = d_col.cast(pa.int64()).to_numpy()
    n = len(cust) * mult
    sv, sc = np.unique(status, return_counts=True)
    pv, pc = np.unique(prio, return_counts=True)
    return pa.table(
        {
            "o_orderkey": pa.array(range(n), pa.int64()),
            "o_custkey": pa.array(
                cust[rng.integers(0, len(cust), size=n)]
                + rng.integers(0, mult, size=n) * n_cust,
                pa.int64(),
            ),
            "o_orderstatus": pa.array(rng.choice(sv, size=n, p=sc / sc.sum())),
            "o_totalprice": pa.array(
                np.round(price[rng.integers(0, len(price), size=n)], 2)
            ),
            "o_orderdate": pa.array(
                np.sort(rng.integers(int(d_int.min()), int(d_int.max()) + 1, size=n)),
                pa.int64(),
            ).cast(d_col.type),
            "o_orderpriority": pa.array(rng.choice(pv, size=n, p=pc / pc.sum())),
        }
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--mult", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(SEED)
    for name, fn in (
        ("documents", gen_documents),
        ("embeddings", gen_embeddings),
        ("part", gen_part),
        ("events", gen_events),
        ("orders", gen_orders),
    ):
        tbl = fn(rng, args.mult)
        pq.write_table(tbl, f"{args.out}/{name}.parquet")
        print(name, tbl.num_rows, "rows")


if __name__ == "__main__":
    main()
