#!/usr/bin/env python
"""Generate a LOCAL measurement-only corpus that mimics the driver's
sf1.0 documents/embeddings tables (the driver's round-6 MEASUREMENT ran
at sf=1.0; only sf<=0.1 exists under /root/testdata).  Token unigram
distribution, doc-length histogram, lang/source marginals are learned
from the committed sf0.1 table, so shingle doc-frequency statistics —
the quantity that drives every inverted-index join's fanout — scale the
same way the driver's generator does.  Output goes to /tmp (never
committed, never read by bench.py or any query): this is a measuring
stick, not a fixture.

Usage: python BENCH/make_docs_sfx.py [n_docs] [out_dir]
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1"
    rng = np.random.default_rng(20260822)

    src = pq.read_table("/root/testdata/sf0.1/documents.parquet")
    texts = src.column("text").to_pylist()
    langs = src.column("lang").to_pylist()

    vocab_counts: dict[str, int] = {}
    lengths = []
    for tx in texts:
        toks = tx.split()
        lengths.append(len(toks))
        for t in toks:
            vocab_counts[t] = vocab_counts.get(t, 0) + 1
    vocab = np.array(sorted(vocab_counts))
    probs = np.array([vocab_counts[v] for v in vocab], dtype=float)
    probs /= probs.sum()
    lengths = np.array(lengths)

    lang_vals, lang_counts = np.unique(langs, return_counts=True)
    lang_p = lang_counts / lang_counts.sum()

    doc_len = rng.choice(lengths, size=n_docs)
    doc_lang = rng.choice(lang_vals, size=n_docs, p=lang_p)
    all_toks = rng.choice(vocab, size=int(doc_len.sum()), p=probs)
    docs, off = [], 0
    for ln in doc_len:
        docs.append(" ".join(all_toks[off : off + ln]))
        off += ln
    # plant exact dups at the committed corpus's rate (~16/5000 docs)
    n_dup = max(n_docs // 300, 2)
    dup_to = rng.integers(0, n_docs, size=n_dup)
    dup_from = rng.integers(0, n_docs, size=n_dup)
    for a, b in zip(dup_to, dup_from):
        docs[a] = docs[b]

    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": pa.array(docs),
            "lang": pa.array(doc_lang.tolist()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array(
                [len(d) for d in docs], type=pa.int64()
            ),
        }
    )
    import os

    os.makedirs(out, exist_ok=True)
    pq.write_table(tbl, f"{out}/documents.parquet")

    n_emb = max(n_docs * 2 // 5, 2000)  # sf0.1 ratio: 2000 emb / 5000 docs
    emb = rng.standard_normal((n_emb, 64)).astype(np.float32)
    etbl = pa.table(
        {
            "vec_id": pa.array(range(n_emb), type=pa.int64()),
            "embedding": pa.array(
                list(emb), type=pa.list_(pa.float32())
            ),
            "label": pa.array(
                (np.arange(n_emb) % 10).astype(np.int32)
            ),
        }
    )
    pq.write_table(etbl, f"{out}/embeddings.parquet")
    print(f"wrote {n_docs} docs + {n_emb} embeddings to {out}")


if __name__ == "__main__":
    main()
