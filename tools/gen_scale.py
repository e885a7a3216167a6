"""Synthesize a larger SF dir from an existing one by deterministic
replication — for SCALE PROBES only (never for correctness oracles).

``python tools/gen_scale.py <src_sf_dir> <dst_dir> <replicas>``

The driver ships sf0.001/0.01/0.1; the 100×-design claims need at least
one measured point beyond sf0.1 (VERDICT r8 #3).  Replication strategy,
chosen so each probed family keeps its sf0.1 workload SHAPE while
cardinalities scale by ``replicas``:

- relational tables (customer/supplier/part/orders/lineitem/events):
  key-shifted copies (key + r × (max+1)); value columns, dates and
  timestamps unchanged — so e.g. the monthly-revenue MV keeps ~80
  months with 10× the rows per month, exactly the shape a bigger feed
  has.  region/nation are dimension tables and copy verbatim.
- documents: replica 0 verbatim; replicas ≥ 1 get a CONTENT-KEYED
  replica marker token injected after every word whose md5 ends in a
  fixed residue (~1 word in 5).  Within a replica, duplicated spans
  stay duplicated (same words → same marker positions and values), so
  dedup/span families see 10× the same duplicate density; across
  replicas every ~5-gram shingle straddles a replica-tagged marker, so
  Jaccard collapses (~0.2-0.3, below near-dup thresholds) and the
  corpus does NOT become 10-cliques of exact copies.
- embeddings: per-replica orthogonal transform (seeded dimension
  permutation + sign flips).  Intra-replica dot products and norms are
  EXACT, so each replica contributes an identical near-pair structure;
  cross-replica similarities randomize.  Replica 0 is identity.

Everything is deterministic in (src bytes, replicas) — reruns are
byte-stable modulo parquet writer metadata.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHIFT_KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
# each foreign key shifts by its REFERENCED table's stride so joins
# stay consistent within a replica
KEY_STRIDE_TABLE = {
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
    "o_orderkey": "orders",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
    "event_id": "events",
    "user_id": None,  # within-events key: stride from its own max
}


def _mark_token(word: str) -> bool:
    return hashlib.md5(word.encode("utf-8", "replace")).digest()[-1] % 5 == 0


def scale_documents(src: str, dst: str, replicas: int) -> None:
    tbl = pq.read_table(src)
    cols = {c: tbl.column(c).to_pylist() for c in tbl.column_names}
    n = tbl.num_rows
    out = {c: [] for c in tbl.column_names}
    for r in range(replicas):
        for i in range(n):
            text = cols["text"][i]
            if r > 0 and text:
                words = text.split(" ")
                marked = []
                for w in words:
                    marked.append(w)
                    if w and _mark_token(w):
                        marked.append(f"@rep{r}")
                text = " ".join(marked)
            out["doc_id"].append(cols["doc_id"][i] + r * n)
            out["text"].append(text)
            out["lang"].append(cols["lang"][i])
            out["source"].append(cols["source"][i])
            out["n_chars"].append(len(text) if text is not None else cols["n_chars"][i])
    pq.write_table(pa.table(out, schema=tbl.schema), dst)


def scale_embeddings(src: str, dst: str, replicas: int) -> None:
    tbl = pq.read_table(src)
    vec_id = np.asarray(tbl.column("vec_id").to_pylist())
    label = np.asarray(tbl.column("label").to_pylist())
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    ids, labels, vecs = [], [], []
    for r in range(replicas):
        if r == 0:
            v = emb
        else:
            rng = np.random.default_rng(1_000_003 * r)
            perm = rng.permutation(dim)
            signs = rng.choice(np.asarray([-1.0, 1.0], dtype=np.float32), size=dim)
            v = emb[:, perm] * signs  # orthogonal: norms + intra dots exact
        ids.append(vec_id + r * n)
        labels.append(label)
        vecs.append(v)
    allv = np.concatenate(vecs)
    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids)),
            "embedding": pa.array(list(allv), type=tbl.schema.field("embedding").type),
            "label": pa.array(np.concatenate(labels), type=tbl.schema.field("label").type),
        },
        schema=tbl.schema,
    )
    pq.write_table(out, dst)


def main() -> int:
    src_dir, dst_dir, replicas = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for t in ("customer", "supplier", "part", "orders", "events"):
        k = {"customer": "c_custkey", "supplier": "s_suppkey", "part": "p_partkey",
             "orders": "o_orderkey", "events": "event_id"}[t]
        strides[t] = (
            con.sql(f"SELECT max({k}) + 1 FROM '{src_dir}/{t}.parquet'").fetchone()[0]
        )
    user_stride = con.sql(
        f"SELECT max(user_id) + 1 FROM '{src_dir}/events.parquet'"
    ).fetchone()[0]

    for t in ("region", "nation"):
        shutil.copyfile(f"{src_dir}/{t}.parquet", f"{dst_dir}/{t}.parquet")
        print(f"{t}: copied (dimension table)")

    for t, keys in SHIFT_KEYS.items():
        cols = [
            c[0]
            for c in con.sql(f"DESCRIBE SELECT * FROM '{src_dir}/{t}.parquet'").fetchall()
        ]
        sel = []
        for c in cols:
            if c in keys:
                ref = KEY_STRIDE_TABLE[c]
                stride = strides[ref] if ref else user_stride
                sel.append(f"{c} + r * {stride} AS {c}")
            else:
                sel.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(sel)} FROM '{src_dir}/{t}.parquet', "
            f"range({replicas}) t(r) ORDER BY r) "
            f"TO '{dst_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT count(*) FROM '{dst_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")

    scale_documents(f"{src_dir}/documents.parquet", f"{dst_dir}/documents.parquet", replicas)
    print("documents: marker-injected replicas")
    scale_embeddings(f"{src_dir}/embeddings.parquet", f"{dst_dir}/embeddings.parquet", replicas)
    print("embeddings: orthogonally-transformed replicas")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
