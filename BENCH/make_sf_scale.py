#!/usr/bin/env python
"""Synthesize a larger-scale measurement dataset from the shipped sf0.1.

The driver deleted its generated /root/testdata/sf1.0 after BENCH_r05; for
in-round stress measurements we rebuild a *statistically matched* stand-in:
documents = fresh word-salads drawn from the sf0.1 vocabulary with the same
length distribution (uniform 10..100 tokens) and lang/source rotation, NOT
row replication (replication would inflate identical-text clusters and
distort the near-dup workload). Relational tables (lineitem/orders/...) are
replicated with remapped keys, preserving join fan-outs per key.

This is measurement scaffolding only — nothing in the query paths reads it
unless $SPARK_GRAFT_SF_DIR points at it explicitly.

Usage: python BENCH/make_sf_scale.py /tmp/sfsynth1.0 10
"""

from __future__ import annotations

import os
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def scale_documents(out_dir: str, mult: int) -> None:
    t = pq.read_table(f"{SRC}/documents.parquet")
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    vocab = sorted({w for x in texts for w in x.split()})
    n_src = len(texts)
    n_out = n_src * mult
    rng = random.Random(20260822)
    out_texts, out_ids, out_lang, out_srcs, out_nchars = [], [], [], [], []
    for i in range(n_out):
        if i < n_src:
            txt = texts[i]  # keep the original rows verbatim
        else:
            txt = " ".join(rng.choice(vocab) for _ in range(rng.randint(10, 100)))
        out_ids.append(i)
        out_texts.append(txt)
        out_lang.append(langs[i % n_src])
        out_srcs.append(sources[i % n_src])
        out_nchars.append(len(txt))
    tbl = pa.table(
        {
            "doc_id": pa.array(out_ids, pa.int64()),
            "text": pa.array(out_texts, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "source": pa.array(out_srcs, pa.string()),
            "n_chars": pa.array(out_nchars, pa.int64()),
        }
    )
    pq.write_table(tbl, f"{out_dir}/documents.parquet")


def scale_relational(out_dir: str, mult: int, name: str, key_cols: dict) -> None:
    t = pq.read_table(f"{SRC}/{name}.parquet")
    if mult == 1:
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        return
    import pyarrow.compute as pc

    chunks = []
    for m in range(mult):
        t2 = t
        if m > 0:
            for col, span in key_cols.items():
                if col in t2.column_names:
                    idx = t2.column_names.index(col)
                    shifted = pc.add(t2.column(col), m * span)
                    t2 = t2.set_column(idx, col, shifted)
        chunks.append(t2)
    pq.write_table(pa.concat_tables(chunks), f"{out_dir}/{name}.parquet")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfsynth1.0"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    scale_documents(out_dir, mult)
    # key spans: large constant offsets keep replicated keys disjoint
    K = 100_000_000
    scale_relational(out_dir, mult, "lineitem", {"l_orderkey": K})
    scale_relational(out_dir, mult, "orders", {"o_orderkey": K, "o_custkey": K})
    scale_relational(out_dir, mult, "customer", {"c_custkey": K})
    scale_relational(out_dir, mult, "events", {"event_id": K, "user_id": K})
    scale_relational(out_dir, mult, "embeddings", {"vec_id": K})
    for small in ("region", "nation", "supplier", "part"):
        scale_relational(out_dir, 1, small, {})
    print(f"wrote {out_dir} (mult={mult})")


if __name__ == "__main__":
    main()
