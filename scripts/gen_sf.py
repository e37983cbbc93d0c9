#!/usr/bin/env python
"""Generate a larger scale factor by replicating a driver fixture dir
with referentially-consistent key offsets (BASELINE.md flags that
Spark's ~0.2 s/action floor dominates sub-100 ms queries at sf0.1; the
judge requires bench evidence at sf >= 1 where it doesn't).

Copy i of every fact row gets its keys shifted by i * (max_key + 1) of
the key's id-space, so FKs keep pointing at the matching copy of the
referenced table (orders copy 3 -> customer copy 3). region/nation are
fixed dimensions and are not replicated. Value columns (dates,
amounts, text, embeddings, nanosecond timestamps) are byte-identical
to the source, so data distributions — and therefore plan selectivity
— match the original fixture. pyarrow end-to-end: preserves the
TIMESTAMP(NANOS) events schema Spark/DuckDB both special-case.

--mutate (documents.text only) makes replicas NEAR- but not
byte-identical, fixing the r10 near-dup DNF-by-fixture: byte-identical
replication gives every text ~factor exact copies with identical
MinHash signatures, so LSH bucket mass grows QUADRATICALLY in the
factor — a corpus shape exact dedup exists to strip, and one that says
nothing about near-dup cost on real data. Mutated replicas instead
mirror a post-exact-dedup corpus: copy 0 stays byte-identical to the
source (so key offsets and plan selectivity hold), copies 1-2 are
LIGHT token mutations (every 32nd token rewritten -> ~90% of 3-word
shingles survive, shingle-Jaccard ~0.8 vs the base — true near-dups,
cluster size bounded at 3 regardless of factor), and every later copy
is HEAVY (every 2nd token rewritten -> every 3-word shingle contains a
mutated token, so shingle sets are disjoint — distinct documents).
All decisions are pure integer arithmetic on (doc_id, copy, token
index): deterministic, no RNG, reproducible across runs.

Usage: python scripts/gen_sf.py [--src /root/testdata/sf0.1] \
           [--out /tmp/sparkgraft/sf1] [--factor 10] [--mutate] \
           [--tables documents,embeddings]
"""

from __future__ import annotations

import argparse
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPY_AS_IS = ("region", "nation")

# id-space -> (table holding its primary key, key column)
SPACES = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "ord": ("orders", "o_orderkey"),
    "evt": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# table -> {column: id-space}
OFFSET_COLS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "ord", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "ord", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "evt", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}


#: --mutate knobs: copies 1.._N_LIGHT are near-dup variants (1 token in
#: _LIGHT_STEP rewritten), later copies are distinct (1 in _HEAVY_STEP).
_N_LIGHT = 2
_LIGHT_STEP = 32
_HEAVY_STEP = 2
_MULT = 2654435761  # Knuth multiplicative hash (the repo's split hash)


def mutate_texts(texts: list, doc_ids: list, copy: int) -> list:
    """Deterministic token-level edits for replica ``copy`` (>= 1) of
    ``documents.text``. The mutation offset varies per (doc, copy) so
    two light copies of one base mutate DIFFERENT positions (they stay
    near-dups of each other too, just farther); the replacement token
    keeps the original as a prefix so token-length distributions move
    minimally."""
    step = _LIGHT_STEP if copy <= _N_LIGHT else _HEAVY_STEP
    out = []
    for d, t in zip(doc_ids, texts):
        toks = t.split(" ")
        off = (d * _MULT + copy * 40503) % step
        # The replacement token is unique per (doc, copy, position):
        # a bounded salt space (the first cut used mod-9973) lets
        # mutated tokens COLLIDE across the corpus, and over a
        # small-vocabulary fixture those collisions manufactured a
        # 45M-gram df-in-[2,4] band at factor 1000 — a rare-gram
        # blocking structure no real corpus has (measured: the r11
        # containment disk-exhaustion probe). Uniqueness makes every
        # mutated 3-gram hapax by construction, so gram df of the
        # mutated corpus is driven by the SOURCE df alone.
        for j in range(off, len(toks), step):
            toks[j] = f"{toks[j]}x{d}c{copy}j{j}"
        out.append(" ".join(toks))
    return out


def mutate_embeddings(emb, vec_ids, copy: int):
    """Deterministic perturbation for replica ``copy`` (>= 1) of
    ``embeddings.embedding`` — the vector twin of ``mutate_texts``
    (r13): byte-identical vector replication collapses every quantizer
    to the duplicate-multiplicity floor (each distinct position's 1000
    copies land in one cell whatever the centroids do), so a scaled
    embedding corpus says nothing about occupancy or pair-mining cost
    on real data. Mutated replicas mirror a post-exact-dedup corpus:
    copies 1.._N_LIGHT add a small hash-direction perturbation (cosine
    ~0.999 vs the base — true near-dups), later copies blend mostly
    INTO the hash direction (cosine ~0.2 — distinct vectors, below
    every house tau). The per-(vec, copy, dim) direction comes from
    pure integer hashing — deterministic, no RNG — and every output is
    re-L2-normalized so the unit-norm invariant the similarity tier
    relies on (dot == cosine) survives."""
    import numpy as np

    ids = np.asarray(vec_ids, dtype=np.uint64)[:, None]
    x = np.asarray(emb, dtype=np.float64)
    j = np.arange(x.shape[1], dtype=np.uint64)[None, :]
    # splitmix64 finalizer over the (id, copy, dim) seed: the first cut
    # used a pure AFFINE map here, which has no bit avalanche — two
    # rows' h values differed by a j-independent constant, so heavy
    # copies of DIFFERENT ids shared systematically correlated
    # directions (measured: 86% of cross-id heavy pairs at cosine
    # >= 0.35, 8% >= 0.9 — manufactured near-dup structure no real
    # corpus has, the r11 bounded-salt lesson all over again; caught in
    # r13 review, pinned by the gen_sf guard test).
    h = (
        ids * np.uint64(_MULT)
        + np.uint64(copy) * np.uint64(40503)
        + j * np.uint64(2246822519)
    )
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    h = h ^ (h >> np.uint64(31))
    u = (h % np.uint64(2**32)).astype(np.float64) / 2**31 - 1.0
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    if copy <= _N_LIGHT:
        y = x + 0.05 * u
    else:
        # blend into the component of u ORTHOGONAL to x so the heavy
        # copy sits at cosine EXACTLY 0.2 vs its base (r13 review: the
        # raw blend's u·x term put an ~11% tail of "distinct" copies
        # above the house tau 0.35 — a blurred copy-class boundary the
        # guard test now pins crisp)
        up = u - (u * x).sum(1, keepdims=True) * x
        n = np.linalg.norm(up, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        y = 0.2 * x + np.sqrt(1.0 - 0.04) * (up / n)
    y /= np.linalg.norm(y, axis=1, keepdims=True)
    return y.astype(np.float32)


def scale_table(
    src: str,
    out: str,
    name: str,
    factor: int,
    bases: dict,
    row_group_size: int,
    mutate: bool = False,
) -> int:
    table = pq.read_table(f"{src}/{name}.parquet")
    # Stream one copy at a time so factor=100 never holds 100 copies in
    # RAM. row_group_size matters: Spark and DuckDB both parallelize
    # parquet scans at row-group granularity (the sf0.1 fixtures are a
    # single row group, which serializes the scan); ~150k-row groups
    # mirror the layout a real multi-file 100 TB table would have.
    with pq.ParquetWriter(f"{out}/{name}.parquet", table.schema) as writer:
        writer.write_table(table, row_group_size=row_group_size)
        for i in range(1, factor):
            cols = []
            for col_name in table.column_names:
                col = table.column(col_name)
                space = OFFSET_COLS[name].get(col_name)
                if space is not None:
                    shifted = pc.add(col, i * bases[space])
                    col = shifted.cast(col.type)  # keep the source int width
                elif mutate and name == "documents" and col_name == "text":
                    base_ids = table.column("doc_id").to_pylist()
                    col = pa.chunked_array(
                        [
                            pa.array(
                                mutate_texts(col.to_pylist(), base_ids, i),
                                type=col.type,
                            )
                        ]
                    )
                elif mutate and name == "embeddings" and col_name == "embedding":
                    base_ids = table.column("vec_id").to_pylist()
                    col = pa.chunked_array(
                        [
                            pa.array(
                                [
                                    [float(v) for v in row]
                                    for row in mutate_embeddings(
                                        col.to_pylist(), base_ids, i
                                    )
                                ],
                                type=col.type,
                            )
                        ]
                    )
                cols.append(col)
            writer.write_table(
                pa.table(dict(zip(table.column_names, cols))),
                row_group_size=row_group_size,
            )
    return table.num_rows * factor


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sparkgraft/sf1")
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--row-group-size", type=int, default=150_000)
    ap.add_argument("--mutate", action="store_true",
                    help="mutate replicated documents.text (token edits) and "
                         "embeddings.embedding (hash-direction perturbation): "
                         "near-dup copies 1-2, distinct copies 3+")
    ap.add_argument("--tables", default=None,
                    help="comma-separated subset of tables to generate "
                         "(default: all)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    only = set(args.tables.split(",")) if args.tables else None

    bases = {}
    for space, (tbl_name, col) in SPACES.items():
        t = pq.read_table(f"{args.src}/{tbl_name}.parquet", columns=[col])
        bases[space] = int(pc.max(t.column(col)).as_py()) + 1

    for name in COPY_AS_IS:
        if only is not None and name not in only:
            continue
        t = pq.read_table(f"{args.src}/{name}.parquet")
        pq.write_table(t, f"{args.out}/{name}.parquet")
        print(f"{name}: {t.num_rows} rows (copied)")
    for name in OFFSET_COLS:
        if only is not None and name not in only:
            continue
        n = scale_table(
            args.src, args.out, name, args.factor, bases,
            args.row_group_size, mutate=args.mutate,
        )
        print(
            f"{name}: {n} rows (x{args.factor}"
            f"{', mutated' if args.mutate and name in ('documents', 'embeddings') else ''})"
        )


if __name__ == "__main__":
    main()
