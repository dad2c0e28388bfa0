#!/usr/bin/env python3
"""Derive an ~sf10 documents profile from data/sf1 by a further 10x
token-disjoint replication — the same construction (and the same
linear-by-construction argument) as tools/make_sf1.py, one decade up:
replica s > 0 prefixes every whitespace token with 'p{s}', which is
disjoint from both the original token space and sf1's 'q{r}' prefixes, so
all 100 effective sf0.1 copies share no tokens and every bucketed path's
work grows exactly 100x vs sf0.1 (outputs/candidates are 100.000x by
construction — verified at the sf1 decade in BENCH_NOTES round 11).

doc_id -> s*100_000_000 + sf1_doc_id keeps doc_id % 10 (the corpus/incoming
split) identical in every replica. Only documents.parquet is generated —
the sf10 spot-check runs the two heaviest docs-side queries, nothing else.
"""
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/repo/data/sf1/documents.parquet"
DST_DIR = "/root/repo/data/sf10"
DST = os.path.join(DST_DIR, "documents.parquet")


def main():
    t = pq.read_table(SRC)
    doc_id = t.column("doc_id").to_pylist()
    text = t.column("text").to_pylist()
    lang = t.column("lang").to_pylist()
    source = t.column("source").to_pylist()

    # disjointness precondition (the make_sf1 argument): no source token may
    # already start with p1..p9 or a replica of 'x' would collide with 'p<s>x'
    ptok = re.compile(r"(?:^|\s)p[1-9]")
    offenders = sum(1 for s in text if ptok.search(s))
    assert offenders == 0, (
        f"{offenders} sf1 docs contain tokens starting with p1..p9 - "
        "replica token spaces would overlap; pick a different prefix")

    ids, texts, langs, sources, n_chars = [], [], [], [], []
    for s in range(10):
        if s == 0:
            rep = text
        else:
            pre = f"p{s}"
            rep = [re.sub(r"(\S+)", pre + r"\1", x) for x in text]
        ids.extend(s * 100_000_000 + d for d in doc_id)
        texts.extend(rep)
        langs.extend(lang)
        sources.extend(source)
        n_chars.extend(len(x) for x in rep)

    out = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array(n_chars, pa.int64()),
    })
    os.makedirs(DST_DIR, exist_ok=True)
    pq.write_table(out, DST)
    print(f"wrote {DST}: {out.num_rows} rows, "
          f"{os.path.getsize(DST) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
