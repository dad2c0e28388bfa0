#!/usr/bin/env python3
"""Derive ~sf1 customer + supplier fixtures from sf0.1 by 10x replication
under a per-replica CHARACTER BIJECTION (Caesar shift of letters within case
and digits within 0-9; '#' and spaces fixed).

Why a bijection and not the documents fixture's q-prefix trick
(make_sf1.py): the jac_rs flagships tokenize names with QGrams(3), and a
prefixed copy of a name SHARES almost all its 3-grams with the original —
replicas would cross-match and the pair graph would grow superlinearly by
construction. A character bijection instead (a) preserves every within-
replica qgram equality, so each replica's candidate/pair structure is
EXACTLY the source's, and (b) makes cross-replica qgram spaces disjoint for
every 3-gram CONTAINING A LETTER (letters shift within a 26-cycle, digits
within a 10-cycle, so a letter-bearing 3-gram never maps onto another
replica's). Pure-digit 3-grams are NOT disjoint — the digit Caesar maps
'000' of replica 1 to '111', which replica 0 already contains — so the
numeric key tails still produce SOME cross-replica candidates; those share
only digit trigrams out of a ~18-token name and die at the length/overlap
filters for t >= 0.3 (zero cross-replica pairs observed in the sf1 gate
outputs). Candidate work on the banded/prefix-filtered paths is therefore
linear-dominated rather than linear by construction; the measured sf1
decade ratios (8.5x/decade R x S) are the evidence the residual
digit-trigram fan-out stays negligible.

Keys: replica r offsets keys by r*10_000_000, preserving key % 10 (the
corpus/incoming split convention) and keeping replica key ranges disjoint.
"""
import os

import pyarrow as pa
import pyarrow.parquet as pq

SRC_DIR = "/root/testdata/sf0.1"
DST_DIR = "/root/repo/data/sf1"


def shift_name(s: str, r: int) -> str:
    out = []
    for ch in s:
        if "a" <= ch <= "z":
            out.append(chr((ord(ch) - 97 + r) % 26 + 97))
        elif "A" <= ch <= "Z":
            out.append(chr((ord(ch) - 65 + r) % 26 + 65))
        elif "0" <= ch <= "9":
            out.append(chr((ord(ch) - 48 + r) % 10 + 48))
        else:
            out.append(ch)
    return "".join(out)


def replicate(table: str, key: str, name: str):
    t = pq.read_table(os.path.join(SRC_DIR, f"{table}.parquet"))
    cols = {c: t.column(c).to_pylist() for c in t.column_names}
    out = {c: [] for c in t.column_names}
    for r in range(10):
        for c in t.column_names:
            if c == key:
                out[c].extend(r * 10_000_000 + k for k in cols[c])
            elif c == name:
                out[c].extend(cols[c] if r == 0
                              else [shift_name(s, r) for s in cols[c]])
            else:
                out[c].extend(cols[c])
    schema_cols = {}
    for c in t.column_names:
        typ = t.schema.field(c).type
        schema_cols[c] = pa.array(out[c], typ)
    dst = os.path.join(DST_DIR, f"{table}.parquet")
    pq.write_table(pa.table(schema_cols), dst)
    print(f"{dst}: {t.num_rows} -> {10 * t.num_rows} rows")


def main():
    os.makedirs(DST_DIR, exist_ok=True)
    replicate("customer", "c_custkey", "c_name")
    replicate("supplier", "s_suppkey", "s_name")


if __name__ == "__main__":
    main()
