"""Synthesize an N×-scaled copy of an sf directory for scaling headroom
checks (VERDICT r3 'Next round' #9): replicate every table R times with
key shifts, preserving referential integrity (replica i's orders point at
replica i's customers) and — crucially — preserving the per-replica
SIMILARITY STRUCTURE of the fuzzy tables without creating cross-replica
duplicates:

- documents: per-replica token-suffix bijection (`the cat` → `the_3 cat_3`).
  A vocabulary bijection maps each replica's shingle sets isomorphically,
  so within-replica pair Jaccards are IDENTICAL to the original corpus and
  cross-replica shingle overlap is zero → near-dup pair counts scale
  exactly linearly (measured: 256 pairs at sf0.1 → 2560 at 10×). A naive
  3-char prefix perturbation instead leaves J≈0.9 against the original
  and blows pairs up 1000×.
- embeddings: per-replica coordinate permutation. Permutations are
  orthogonal, so within-replica cosines are bit-preserved; cross-replica
  cosines are draws from the corpus's random-pair cosine distribution.
  NOTE: this still grows dedup_embedding_cosine's candidate set
  quadratically, because that is a property of the DATA + threshold (a
  0.45 cutoff sits inside the bulk of this corpus's random-pair cosine
  distribution, so a fixed ~0.006% of ALL pairs qualifies) — see
  ROUND4_NOTES.md for the design implication.

Usage: python tools/make_scaled_sf.py [src_sf_dir] [dest_dir] [replicas]
"""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq


def shift_concat(src: str, dst: str, name: str, shifts: dict[str, int], r: int) -> None:
    t = pq.read_table(f"{src}/{name}.parquet")
    parts = []
    for i in range(r):
        cols = {}
        for c in t.column_names:
            col = t.column(c)
            if c in shifts and i > 0:
                col = pc.add(col, shifts[c] * i)
            cols[c] = col
        parts.append(pa.table(cols))
    out = pa.concat_tables(parts)
    pq.write_table(out, f"{dst}/{name}.parquet", compression="snappy")
    print(name, out.num_rows)


def make_documents(src: str, dst: str, r: int) -> None:
    t = pq.read_table(f"{src}/documents.parquet").to_pandas()
    parts = []
    for i in range(r):
        d = t.copy()
        if i:
            d["doc_id"] = d["doc_id"] + 1_000_000 * i
            d["text"] = d["text"].str.replace(" ", f"_{i} ", regex=False) + f"_{i}"
            d["n_chars"] = d["text"].str.len().astype("int64")
        parts.append(d)
    docs = pd.concat(parts, ignore_index=True)
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        f"{dst}/documents.parquet",
        compression="snappy",
    )
    print("documents", len(docs))


def make_embeddings(src: str, dst: str, r: int) -> None:
    t = pq.read_table(f"{src}/embeddings.parquet")
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    vec_id = t.column("vec_id").to_numpy()
    label = t.column("label").to_numpy()
    parts = []
    for i in range(r):
        e = emb[:, np.random.RandomState(1000 + i).permutation(emb.shape[1])] if i else emb
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vec_id + 1_000_000 * i),
                    "embedding": pa.array(list(e), type=pa.list_(pa.float32())),
                    "label": pa.array(label, type=pa.int32()),
                }
            )
        )
    embs = pa.concat_tables(parts)
    pq.write_table(embs, f"{dst}/embeddings.parquet", compression="snappy")
    print("embeddings", embs.num_rows)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    r = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import os

    os.makedirs(dst, exist_ok=True)
    for name in ("region", "nation"):  # dims: single copy
        pq.write_table(pq.read_table(f"{src}/{name}.parquet"), f"{dst}/{name}.parquet")
    shift_concat(src, dst, "customer", {"c_custkey": 1_000_000}, r)
    shift_concat(src, dst, "supplier", {"s_suppkey": 100_000}, r)
    shift_concat(src, dst, "part", {"p_partkey": 1_000_000}, r)
    shift_concat(src, dst, "orders", {"o_orderkey": 10_000_000, "o_custkey": 1_000_000}, r)
    shift_concat(
        src,
        dst,
        "lineitem",
        {"l_orderkey": 10_000_000, "l_partkey": 1_000_000, "l_suppkey": 100_000},
        r,
    )
    shift_concat(src, dst, "events", {"event_id": 10_000_000, "user_id": 1_000_000}, r)
    make_documents(src, dst, r)
    make_embeddings(src, dst, r)
    return 0


if __name__ == "__main__":
    sys.exit(main())
