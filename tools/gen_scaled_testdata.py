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
    ):
        tbl = fn(rng, args.mult)
        pq.write_table(tbl, f"{args.out}/{name}.parquet")
        print(name, tbl.num_rows, "rows")


if __name__ == "__main__":
    main()
