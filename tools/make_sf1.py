#!/usr/bin/env python3
"""Derive an ~sf1 documents profile from sf0.1 by 10x token-disjoint replication.

Replica r > 0 prefixes every whitespace token with 'q{r}', so replicas share
no tokens: the near-dup/candidate structure of sf0.1 is replicated exactly,
ten times, in disjoint token spaces. Work on every bucketed path therefore
grows LINEARLY by construction, which is what makes the sf0.1-vs-sf1 wall
ratio a clean scaling-exponent measurement (a superlinear ratio indicts the
engine, not the fixture). Plain replication would instead make every doc an
exact dup of its 9 replicas and rewrite the pair graph.

doc_id -> r*1_000_000 + doc_id keeps doc_id % 10 (the corpus/incoming split
the rs queries use) identical in every replica.
"""
import os
import re
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"
DST_DIR = "/root/repo/data/sf1"
DST = os.path.join(DST_DIR, "documents.parquet")


def main():
    t = pq.read_table(SRC)
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    # Token-disjointness precondition (round-8 advice): replica r > 0
    # prefixes tokens with 'q{r}', so a SOURCE token that already starts
    # with q<digit> (e.g. 'q3abc') would collide with a prefixed replica of
    # 'abc' wherever 'abc' also occurs, silently degrading the
    # linear-by-construction property. Assert it instead of hoping.
    qtok = re.compile(r"(?:^|\s)q[1-9]")
    offenders = sum(1 for s in text if qtok.search(s))
    assert offenders == 0, (
        f"{offenders} source docs contain tokens starting with q1..q9 - "
        "replica token spaces would overlap; pick a different prefix")

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for r in range(10):
        if r == 0:
            rep = text
        else:
            pre = f"q{r}"
            rep = [re.sub(r"(\S+)", pre + r"\1", s) for s in text]
        ids.extend(r * 1_000_000 + d for d in doc_id)
        texts.extend(rep)
        langs.extend(lang)
        sources.extend(source)
        n_chars.extend(len(s) for s in rep)

    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    os.makedirs(DST_DIR, exist_ok=True)
    pq.write_table(out, DST, compression="snappy", row_group_size=10_000)
    print(f"wrote {out.num_rows} rows to {DST}")


if __name__ == "__main__":
    sys.exit(main())
