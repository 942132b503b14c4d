"""Distributed inverted-index construction (term → sorted posting list).

The retrieval-side building block of a training-data platform (BM25 /
decontamination / source-attribution lookups all consume postings).
Reference analogue: the text-anchor table the parser resolves cells
against (`/root/reference/parser/parseServices.js`) is a per-document
index; this op builds the corpus-level one.

Scale design — the naive shape (`groupby(word)` over ALL (word, doc)
pairs) moves token-scale data and builds gigabyte posting lists for
stopwords, which no real index stores. Instead, two bounded passes
(the ``heavy_hitters`` sketch-then-verify discipline applied to df):

1. **df pass** — each batch emits one ``(word, partial_df)`` row per
   distinct (word, doc) pair *in that batch*; a doc's text lives in
   exactly one row, so per-batch distinctness is global distinctness
   and the exchange is vocabulary-sized, not token-sized. A word
   groupby sums partials; words with ``df_lo ≤ df ≤ df_hi`` survive.
   The driver collect is bounded by Σpairs/df_lo (and in practice by
   the vocabulary); it broadcasts ONE sorted numpy word array via
   ``ray.put``.
2. **postings pass** — a second scan emits (word, doc_id) only for
   broadcast words (vectorized ``np.isin`` against the sorted array),
   then one keyed groupby per surviving word builds the sorted,
   comma-joined posting list. The exchange is ≤ df_hi × |index terms|
   slim integer rows — the df_hi cap is exactly why real indexes drop
   stop-terms.

Output: ``(word, df, postings)`` with postings = ','-joined ascending
doc_ids — byte-comparable to the SQL twin's ordered ``string_agg``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import read_parquet_clean

DF_LO = 10
DF_HI = 1000

_TOKEN_RE = r"\S+"


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def inverted_index(sf_dir: str, df_lo: int = DF_LO, df_hi: int = DF_HI):
    import ray
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial_df(df: pd.DataFrame) -> pd.DataFrame:
        # distinct words per doc, counted once per doc within the batch
        words = df["text"].str.findall(_TOKEN_RE).map(lambda ws: list(set(ws)))
        counts = words.explode().dropna().value_counts()
        return pd.DataFrame(
            {"word": counts.index.astype(str), "partial": counts.to_numpy(np.int64)}
        )

    dfs = (
        ds.map_batches(partial_df, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("partial", alias_name="df"))
        .filter(expr=f"df >= {df_lo} and df <= {df_hi}")
        .to_pandas()  # bounded: ≤ Σ(word,doc) pairs / df_lo rows
    )
    terms = np.sort(dfs["word"].to_numpy(dtype=object).astype(str))
    terms_ref = ray.put(terms)

    def emit_pairs(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(terms_ref)
        ids_out: list[np.ndarray] = []
        words_out: list[np.ndarray] = []
        toks = df["text"].str.findall(_TOKEN_RE)
        for doc_id, ws in zip(df["doc_id"].to_numpy(np.int64), toks):
            u = np.unique(np.asarray(ws, dtype=str))
            hit = u[np.isin(u, t, assume_unique=True)]
            if len(hit):
                words_out.append(hit)
                ids_out.append(np.full(len(hit), doc_id, dtype=np.int64))
        if not words_out:
            return pd.DataFrame(
                {
                    "word": np.array([], dtype=str),
                    "doc_id": np.array([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "word": np.concatenate(words_out),
                "doc_id": np.concatenate(ids_out),
            }
        )

    def build_postings(group: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(group["doc_id"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "word": [group["word"].iloc[0]],
                "df": np.array([len(ids)], dtype=np.int64),
                "postings": [",".join(map(str, ids))],
            }
        )

    return (
        ds.map_batches(emit_pairs, batch_format="pandas")
        .groupby("word")
        .map_groups(build_postings, batch_format="pandas")
    )
