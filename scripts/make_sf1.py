"""Deterministic sf1 synthesis: a 10x scale-up of the driver-provided
sf0.1 testdata, built so every headline query's WORK scales linearly
(the property an honest scale bench needs):

- fact/dim tables: 10 replicas with key-shifted PKs/FKs (stride 1e8) —
  join fan-outs and group cardinalities per replica are identical to
  sf0.1, so a linear plan costs exactly 10x;
- documents: replica i > 0 gets a per-replica letter+digit substitution
  cipher. An injective character map transforms each doc's shingle set
  bijectively, so INTRA-replica Jaccard/MinHash/exact-dup structure is
  bit-identical to replica 0 (pair output scales exactly 10x) while
  CROSS-replica shingles collide only if a 5-gram contains no letter
  and no digit (pure punctuation/whitespace — absent from this prose
  corpus), so there is no spurious cross-replica pair blow-up. Digit
  permutation keeps per-class character COUNTS, so quality-score
  ratios (punctuation/digit fractions) are preserved;
- embeddings: replica i > 0 is rotated by a seeded random orthogonal
  matrix. Rotation preserves every intra-replica cosine exactly (pair
  output 10x) and randomizes cross-replica cosines to ~0 (no spurious
  near-dups).

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/spark_graft_sf1)
Writes the ten parquet tables; point SPARK_GRAFT_SF_DIR at the result.
"""

from __future__ import annotations

import random
import string
import sys
from pathlib import Path

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
STRIDE = 100_000_000
REPLICAS = 10


def cipher_args(i: int) -> tuple[str, str]:
    """(from, to) letter+digit permutation for replica i (identity
    for 0). Digits permute among digits so count-based quality ratios
    are unchanged."""
    letters = string.ascii_lowercase
    digits = string.digits
    if i == 0:
        return letters + digits, letters + digits
    rng = random.Random(20260817 + i)
    lperm = list(letters)
    rng.shuffle(lperm)
    dperm = list(digits)
    rng.shuffle(dperm)
    lp, dp = "".join(lperm), "".join(dperm)
    return (
        letters + letters.upper() + digits,
        lp + lp.upper() + dp,
    )


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1")
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()

    for t in ("region", "nation"):  # fixed dims: copy
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )

    shifted = {
        "customer": ["c_custkey"],
        "supplier": ["s_suppkey"],
        "part": ["p_partkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
        "events": ["event_id", "user_id"],
    }
    for t, keys in shifted.items():
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
        sel = ", ".join(
            f"{c} + i * {STRIDE} AS {c}" if c in keys else c for c in cols
        )
        con.sql(
            f"""COPY (
                 SELECT {sel}
                 FROM '{SRC}/{t}.parquet'
                 CROSS JOIN (SELECT unnest(range({REPLICAS})) AS i) g
               ) TO '{out}/{t}.parquet' (FORMAT PARQUET)"""
        )

    # documents: per-replica substitution cipher on letters only (digits,
    # punctuation, whitespace unchanged -> quality-score ratios preserved)
    parts = []
    for i in range(REPLICAS):
        frm, to = cipher_args(i)
        parts.append(
            f"""SELECT doc_id + {i * STRIDE} AS doc_id,
                 translate(text, '{frm}', '{to}') AS text,
                 lang, source, n_chars
               FROM '{SRC}/documents.parquet'"""
        )
    con.sql(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' (FORMAT PARQUET)"
    )

    # embeddings: seeded orthogonal rotation per replica
    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = tbl["vec_id"].to_numpy()
    emb = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    label = tbl["label"].to_numpy()
    d = emb.shape[1]
    ids_out, emb_out, lab_out = [], [], []
    for i in range(REPLICAS):
        if i == 0:
            rot = np.eye(d)
        else:
            rng = np.random.default_rng(777 + i)
            rot, _ = np.linalg.qr(rng.standard_normal((d, d)))
        ids_out.append(vec_id + i * STRIDE)
        emb_out.append(emb @ rot)
        lab_out.append(label)
    out_tbl = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids_out), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in np.vstack(emb_out)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(np.concatenate(lab_out), type=pa.int32()),
        }
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet")

    for t in list(shifted) + ["region", "nation", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
