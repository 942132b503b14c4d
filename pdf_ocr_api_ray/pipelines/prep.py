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


# ---------------------------------------------------------------------------
# T5-style span-corruption sample prep

CORRUPT_STRIDE = 8  # anchors at pos % 8 == 0 — spans never overlap
CORRUPT_PCT = 40  # anchor selected when md5 draw % 100 < 40
CORRUPT_MAX_LEN = 3  # span length 1..3 (< stride by construction)


def span_corruption(sf_dir: str):
    """Denoising-objective sample prep (T5 span corruption, Raffel et
    al. 2020): deterministically mask token spans and emit the
    (input_text, target_text) pair per document — masked spans collapse
    to ordinal ``<extra_id_k>`` sentinels in the input, and the target
    is the sentinel-delimited sequence of masked tokens.

    Randomness is md5-keyed on ``(doc_id, position)`` like every draw
    in this engine (resume-stable, block-layout independent): span
    anchors sit at ``pos % CORRUPT_STRIDE == 0``; an anchor is selected
    when its low-64 draw ``% 100 < CORRUPT_PCT`` and masks
    ``1 + (high-64 draw % CORRUPT_MAX_LEN)`` tokens. MAX_LEN < STRIDE
    makes spans provably non-overlapping, so the whole op is ONE
    stateless vectorized scan — coverage is a +1/−1 diff-cumsum (the
    ``dedup_substrings`` kernel), sentinel ordinals a per-row cumsum —
    and the SQL twin replays the identical hex arithmetic.
    """
    import hashlib

    import numpy as np

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    sent = np.array(
        [f"<extra_id_{k}>" for k in range(4096)], dtype=object
    )  # 4096 spans needs a 32k-token doc at PCT=100 — plenty

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        counts = toks.str.len().to_numpy(dtype=np.int64)
        n_rows = len(df)
        doc_ids = df["doc_id"].to_numpy(dtype=np.int64)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "n_tokens": counts,
                    "n_spans": np.zeros(n_rows, dtype=np.int64),
                    "n_masked": np.zeros(n_rows, dtype=np.int64),
                    "input_text": [""] * n_rows,
                    "target_text": [""] * n_rows,
                }
            )
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), counts)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        row_end = np.repeat(starts + counts, counts)

        a_idx = np.flatnonzero(pos % CORRUPT_STRIDE == 0)
        sel = np.zeros(len(a_idx), dtype=bool)
        ln = np.zeros(len(a_idx), dtype=np.int64)
        for j, i in enumerate(a_idx):
            h = hashlib.md5(
                f"corrupt|{doc_ids[row_idx[i]]}|{pos[i]}".encode()
            ).digest()
            sel[j] = int.from_bytes(h[:8], "little") % 100 < CORRUPT_PCT
            ln[j] = int.from_bytes(h[8:16], "little") % CORRUPT_MAX_LEN + 1
        s_flat = a_idx[sel]
        s_len = ln[sel]
        e_flat = np.minimum(s_flat + s_len, row_end[s_flat])

        diff = np.zeros(total + 1, dtype=np.int64)
        np.add.at(diff, s_flat, 1)
        np.add.at(diff, e_flat, -1)
        cover = np.cumsum(diff[:-1]) > 0
        ss = np.zeros(total, dtype=bool)
        ss[s_flat] = True

        c = np.cumsum(ss.astype(np.int64))
        row_prefix = np.repeat(c[starts] - ss[starts].astype(np.int64), counts)
        k_ord = c - 1 - row_prefix  # sentinel ordinal, valid at span starts

        # input: unmasked tokens, each span collapsed to its sentinel
        keep = ~cover | ss
        in_tok = np.where(ss, sent[np.minimum(k_ord, len(sent) - 1)], flat)
        input_text = (
            pd.Series(in_tok[keep], dtype=object)
            .groupby(row_idx[keep])
            .agg(" ".join)
            .reindex(range(n_rows), fill_value="")
            .to_numpy(dtype=object)
        )
        # target: <extra_id_k> then the span's masked tokens, in order
        idx_c = np.flatnonzero(cover)
        rep = 1 + ss[idx_c].astype(np.int64)
        expanded = np.repeat(idx_c, rep)
        offs = np.concatenate([[0], np.cumsum(rep)[:-1]])
        sent_mask = np.zeros(len(expanded), dtype=bool)
        sent_mask[offs[rep == 2]] = True
        tgt_tok = np.where(
            sent_mask, sent[np.minimum(k_ord[expanded], len(sent) - 1)], flat[expanded]
        )
        target_text = (
            pd.Series(tgt_tok, dtype=object)
            .groupby(row_idx[expanded])
            .agg(" ".join)
            .reindex(range(n_rows), fill_value="")
            .to_numpy(dtype=object)
        )
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "n_tokens": counts,
                "n_spans": np.bincount(
                    row_idx[s_flat], minlength=n_rows
                ).astype(np.int64),
                "n_masked": np.bincount(
                    row_idx, weights=cover.astype(np.float64), minlength=n_rows
                ).astype(np.int64),
                "input_text": input_text,
                "target_text": target_text,
            }
        )

    return ds.map_batches(corrupt, batch_format="pandas")
