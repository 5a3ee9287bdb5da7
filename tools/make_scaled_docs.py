"""Derive a larger `documents` corpus for scaling runs (SCALING.md).

/root/testdata tops out at sf0.1 (5,000 documents) and is read-only,
so the sf1-scale validation corpus is DERIVED: `scale` x 10,000
documents sampled from the sf0.1 corpus's own empirical distributions
— unigram word frequencies and document word-lengths — with a fixed
numpy seed. This reproduces the word-soup generator's statistical
shape (vocabulary, Zipf weights, length profile) without replicating
texts verbatim, which matters because verbatim replicas would plant
artificial near-duplicate clusters and corrupt exactly the pair-join
selectivity the scaling run is supposed to measure.

Output: {out_dir}/documents.parquet with the sf0.1 schema
(doc_id, text, lang, source, n_chars). Used ONLY for performance
scaling measurements — correctness oracles stay on the driver-provided
/root/testdata parquet, untouched.

Usage: python tools/make_scaled_docs.py [out_dir] [n_docs]
       (defaults: /root/repo/.scratch/sf1x 50000)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1/documents.parquet"
SEED = 42


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scratch/sf1x"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    rng = np.random.default_rng(SEED)

    src = pq.read_table(SRC).to_pandas()
    words = np.concatenate([t.split() for t in src["text"].str.lower()])
    vocab, counts = np.unique(words, return_counts=True)
    probs = counts / counts.sum()
    lengths = src["text"].str.split().str.len().to_numpy()
    langs = src["lang"].to_numpy()
    sources = src["source"].to_numpy()

    doc_lens = rng.choice(lengths, size=n_docs, replace=True)
    total = int(doc_lens.sum())
    flat = rng.choice(vocab, size=total, replace=True, p=probs)
    offsets = np.concatenate([[0], np.cumsum(doc_lens)])
    texts = [
        " ".join(flat[offsets[i] : offsets[i + 1]]) for i in range(n_docs)
    ]
    out = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
            "text": pa.array(texts),
            "lang": pa.array(rng.choice(langs, size=n_docs, replace=True)),
            "source": pa.array(rng.choice(sources, size=n_docs, replace=True)),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(out, f"{out_dir}/documents.parquet")
    print(
        f"wrote {n_docs} docs ({total} tokens, vocab {len(vocab)}) "
        f"-> {out_dir}/documents.parquet"
    )


if __name__ == "__main__":
    main()
