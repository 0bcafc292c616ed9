"""Generate sf1.0 (10x bench scale) fixtures for the scale soak.

The driver ships sf0.001/0.01/0.1 only; the round-5 soak (VERDICT r4
item 1) needs one more decade to MEASURE the growth curves the 100 TB
claims rest on. sf1.0 here is a 10x key-space translation of sf0.1:

- every copy k gets DISJOINT key ranges (orderkey/custkey/partkey/
  suppkey/doc_id/... shifted by k * OFFSET), so joins and co-purchase
  graphs stay within a copy — edges, components, and candidate pairs
  grow exactly linearly by construction, which is precisely the
  yardstick the soak asserts the OPERATORS against;
- dimension tables (region/nation) are fixed, like real scale-up;
- document text is rotated per copy (a per-copy Caesar map over
  [a-z0-9A-Z] via str.translate): word lengths, shingle counts and
  within-copy similarity are EXACTLY preserved, cross-copy shingle
  overlap is zero — so near-dup workloads scale linearly instead of
  exploding quadratically on artificial replicas;
- embeddings get a tiny per-copy offset on element 0 (breaks exact
  cross-copy duplicates, leaves the distribution intact).

Usage: python tools/gen_scale_data.py [out_dir] [n_copies]
Default: <repo>/.scale/sf1.0, 10 copies.
"""

from __future__ import annotations

import os
import string
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = os.environ.get("SCALE_SRC_DIR", "/root/testdata/sf0.1")

# disjoint-key offsets, all comfortably above sf0.1's max keys
OFF = 1 << 40

# which integer columns shift per copy (key-space translation)
SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED_TABLES = ["region", "nation"]  # dimensions don't scale


def _rot_table(k: int) -> dict[int, int]:
    """Per-copy character substitution over lowercase, uppercase,
    digits — a PERMUTATION drawn per copy (deterministic LCG
    Fisher-Yates), not a rotation: the round-10 generator's Caesar
    shift cycles every 26 copies, so a 100-copy decade (sf10) made
    copies k and k+26 near-identical in letters — REAL cross-copy
    near-duplicates that blew LSH candidate volume up 32× past
    linear (observed: q51 3200× rows at 100× data). Two independent
    random permutations agree on a whole shingle with probability
    ~(1/52)^|distinct chars| ≈ 0, so cross-copy shingle overlap stays
    zero at ANY copy count; within-copy structure (word lengths,
    shingle counts, self-similarity) is preserved exactly as before.
    k=0 is the identity (copy 0 IS the source)."""
    out: dict[int, int] = {}
    if k == 0:
        return out
    state = 0x9E3779B9 * (k + 1) & 0xFFFFFFFF
    def rnd(n: int) -> int:
        nonlocal state
        state = (state * 1664525 + 1013904223) & 0xFFFFFFFF
        return state % n
    for alphabet in (string.ascii_lowercase, string.ascii_uppercase, string.digits):
        perm = list(alphabet)
        for i in range(len(perm) - 1, 0, -1):
            j = rnd(i + 1)
            perm[i], perm[j] = perm[j], perm[i]
        for ch, to in zip(alphabet, perm):
            out[ord(ch)] = ord(to)
    return out


def _shift_copy(tbl: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0 and name != "documents":
        return tbl
    for col in SHIFT_COLS.get(name, []):
        idx = tbl.schema.get_field_index(col)
        f = tbl.schema.field(idx)
        shifted = pc.add(tbl.column(idx), pa.scalar(k * OFF, type=f.type))
        tbl = tbl.set_column(idx, f, shifted.cast(f.type))
    if name == "documents" and k > 0:
        rot = _rot_table(k)
        texts = tbl.column("text").to_pylist()
        rotated = [t.translate(rot) if t is not None else None for t in texts]
        ti = tbl.schema.get_field_index("text")
        tbl = tbl.set_column(ti, tbl.schema.field(ti), pa.array(rotated, pa.string()))
    if name == "embeddings" and k > 0:
        vecs = tbl.column("embedding").to_pylist()
        for v in vecs:
            if v:
                v[0] = float(np.float32(v[0] + k * 1e-3))
        ei = tbl.schema.get_field_index("embedding")
        tbl = tbl.set_column(
            ei, tbl.schema.field(ei), pa.array(vecs, tbl.schema.field(ei).type)
        )
    return tbl


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf1.0"
    )
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    for name in FIXED_TABLES:
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        pq.write_table(src, os.path.join(out_dir, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} rows (fixed dimension)")
    for name in SHIFT_COLS:
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        # stream copies through one ParquetWriter instead of a single
        # concat: a second decade (sf10 = 100 copies — round-10
        # verdict #4) would otherwise materialize 60M lineitem rows
        # in memory at once; peak stays ONE copy this way
        out_path = os.path.join(out_dir, f"{name}.parquet")
        total = 0
        with pq.ParquetWriter(out_path, src.schema) as writer:
            for k in range(n_copies):
                copy = _shift_copy(src, name, k)
                writer.write_table(copy)
                total += copy.num_rows
        print(f"{name}: {src.num_rows} -> {total} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
