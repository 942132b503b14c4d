"""Composed training-data preparation pipeline — the end-to-end shape a
100-TB corpus prep actually runs: exact dedup → quality gate → token
accounting, chained as ONE streaming Dataset (no stage materializes).

    documents
      → content-hash + quality metrics per batch (one text pass)
      → groupby(content_hash): survivor = min doc_id   (the only shuffle)
      → quality filter (stop-ratio/length heuristic)
      → per-language token budget aggregate

Output: one row per language with surviving doc and token counts —
the "what goes into the tokenizer" summary. Fully SQL-expressible, so
the whole composition is value-checked against DuckDB.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from ._util import read_parquet_clean, round_half_away
from .text import STOPWORDS_RE, _TOKEN_RE


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


QUALITY_MIN = 0.3


def training_prep(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        toks = lower.str.count(_TOKEN_RE).clip(lower=1)
        stops = lower.str.count(STOPWORDS_RE)
        stop_ratio = round_half_away(stops / toks, 4)
        len_term = (toks / 100.0).clip(upper=1.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "lang": df["lang"],
                "content_hash": df["text"].map(
                    lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
                ),
                "n_tokens": lower.str.count(_TOKEN_RE).astype("int64"),
                "quality": round_half_away(0.5 * stop_ratio + 0.5 * len_term, 4),
            }
        )

    scored = ds.map_batches(metrics, batch_format="pandas")

    # survivor pick per content-hash, amortized over 256 hash buckets
    # (one Ray group per bucket; inside, one vectorized drop_duplicates
    # across all hashes of the bucket — not one Python call per hash)
    NUM_HASH_BUCKETS = 256

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["hb"] = (
            df["content_hash"].str.slice(0, 4).apply(int, base=16) % NUM_HASH_BUCKETS
        ).astype("int32")
        return df

    def survivors_bucket(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["content_hash", "doc_id"]).drop_duplicates(
            "content_hash", keep="first"
        )
        return g[["doc_id", "lang", "n_tokens", "quality"]]

    survivors = (
        scored.map_batches(add_bucket, batch_format="pandas")
        .groupby("hb")
        .map_groups(survivors_bucket, batch_format="pandas")
    )
    kept = survivors.filter(expr=f"quality >= {QUALITY_MIN}")

    return kept.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_tokens", alias_name="total_tokens"),
    )
