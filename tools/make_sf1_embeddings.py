#!/usr/bin/env python3
"""Derive an ~sf1 embeddings profile from sf0.1 by 10x signed-permutation
replication — the ANN counterpart of make_sf1.py.

Replica r > 0 applies a fixed SIGNED COORDINATE PERMUTATION (seeded by r) to
every vector: an orthogonal transform over the same component multiset, so
every within-replica cosine is preserved up to FLOAT SUMMATION REORDERING
(~ulp): the dot product of two identically-permuted, identically-sign-flipped
vectors sums the same MULTISET of component products, but the sequential IEEE
fold adds them in a different ORDER, so dot and norm sums differ in the last
ulps and borderline threshold/top-k pairs can flip between replicas. The
near-dup / top-k structure of sf0.1 therefore replicates only APPROXIMATELY —
do not build an exact-count assertion on per-replica structure being
identical. Cross-replica cosines are NOT provably bounded (unlike the token
fixture's disjointness) — two different signed permutations of similar
vectors are merely uncorrelated — so this fixture supports SCALING
measurements (candidate volume grows ~linearly in expectation) but not
exact-count assertions across replicas; the generator prints the observed
cross-replica pair count at the bench threshold so a run can quote it.

vec_id -> r*1_000_000 + vec_id keeps vec_id-range query predicates
meaningful in every replica.
"""
import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/embeddings.parquet"
DST_DIR = "/root/repo/data/sf1"
DST = os.path.join(DST_DIR, "embeddings.parquet")


def main():
    t = pq.read_table(SRC)
    vec_id = t.column("vec_id").to_pylist()
    emb = t.column("embedding").to_pylist()
    label = t.column("label").to_pylist()
    dim = len(emb[0])

    ids, vecs, labels = [], [], []
    for r in range(10):
        if r == 0:
            rep = emb
        else:
            rnd = random.Random(7000 + r)
            perm = list(range(dim))
            rnd.shuffle(perm)
            signs = [rnd.choice((-1.0, 1.0)) for _ in range(dim)]
            rep = [[signs[j] * v[perm[j]] for j in range(dim)] for v in emb]
        ids.extend(r * 1_000_000 + i for i in vec_id)
        vecs.extend(rep)
        labels.extend(label)

    out = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array(labels, t.column("label").type),
    })
    os.makedirs(DST_DIR, exist_ok=True)
    pq.write_table(out, DST, compression="snappy", row_group_size=10_000)
    print(f"wrote {out.num_rows} rows to {DST} (dim={dim})")

    # quote the cross-replica contamination at the bench threshold (0.4):
    # sample replica-0 query rows vs replica-1 corpus in DuckDB
    try:
        import duckdb
        con = duckdb.connect()
        n = con.execute(f"""
          SELECT count(*) FROM read_parquet('{DST}') a, read_parquet('{DST}') b
          WHERE a.vec_id < 50 AND b.vec_id >= 1000000 AND b.vec_id < 2000000
            AND list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
                (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
                 sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))) >= 0.4
        """).fetchone()[0]
        print(f"cross-replica pairs (50 r0 queries x r1 corpus, cos>=0.4): {n}")
    except Exception as e:  # duckdb is a driver-side convenience only
        print(f"cross-replica check skipped: {e}")


if __name__ == "__main__":
    sys.exit(main())
