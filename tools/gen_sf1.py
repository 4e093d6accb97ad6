"""Synthesize an sf1 fixture set (10x sf0.1) for the scale probe.

VERDICT r12 item 6: the scale claims are argued from plan shape; this
gives one MEASURED datapoint at 10x bench scale. The driver's fixtures
are read-only and no generator ships with them, so sf1 is synthesized
from sf0.1 as TEN structure-preserving disjoint copies:

- fact/dim tables replicate with per-copy key offsets (copy i shifts
  every key family by i * 10_000_000), so FK integrity holds and the
  shipment graph becomes 10 disjoint copies of the sf0.1 graph — node
  and edge counts scale 10x while degree structure is preserved, which
  is the honest shape for probing the iterative graph kernels;
- region/nation stay fixed (bounded dimensions at any scale);
- events replicate with event_id/user_id offsets and UNCHANGED
  timestamps (same 30-day window, 10x density — how a busier stream
  actually scales);
- documents replicate with doc_id offsets and a PER-COPY TOKEN SUFFIX
  ("tok" -> "tok~c3") on every token of copies 1-9: intra-copy token
  equality structure (and thus shingle/near-dup/TF-IDF/graph-of-words
  structure) is preserved bijectively, while cross-copy shingle
  overlap is ZERO — without this, every doc would have 9 exact
  twins and the minhash bucket pair space would grow 100x, not 10x;
- embeddings replicate with vec_id offsets and a tiny deterministic
  per-copy nudge on one dimension (dim = copy-1 mod 64, +copy * 1e-3)
  so no two copies are exact duplicate points (which would make every
  kNN a 10-way tie).

Output: /root/repo/.sf1/ (gitignored, ~170 MB). Deterministic —
re-running reproduces byte-identical logical content.

Usage: python tools/gen_sf1.py [copies]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = "/root/repo/.sf1"
OFF = 10_000_000

KEY_OFFSETS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _suffix_tokens(texts: list[str], tag: str) -> list[str]:
    return [" ".join(t + tag for t in s.split()) for s in texts]


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DST, exist_ok=True)
    for name in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{name}.parquet"),
                       f"{DST}/{name}.parquet")
        print(name, "copied")
    for name, keys in KEY_OFFSETS.items():
        base = pq.read_table(f"{SRC}/{name}.parquet")
        schema = base.schema
        base_pdf = base.to_pandas()
        parts = []
        for i in range(copies):
            df = base_pdf.copy()
            for k in keys:
                df[k] = df[k] + i * OFF
            if i > 0 and name == "documents":
                df["text"] = _suffix_tokens(list(df["text"]), f"~c{i}")
                df["n_chars"] = df["text"].str.len()
            if i > 0 and name == "embeddings":
                emb = np.stack(df["embedding"].to_numpy())
                emb[:, (i - 1) % emb.shape[1]] += i * 1e-3
                df["embedding"] = list(emb)
            parts.append(pa.Table.from_pandas(df, schema=schema,
                                              preserve_index=False))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{DST}/{name}.parquet")
        print(name, out.num_rows, "rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
