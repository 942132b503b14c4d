"""Multimodal column plumbing (image/audio treated as opaque binary +
typed metadata) with a STUBBED decode step.

The container has no image/audio codecs, so the decode is a
deterministic fake behind ``MediaDecoder`` (clearly marked); the
Ray-side plumbing — actor-pool stage, schema, batch sizing for large
binary payloads — is real and tested. A production deployment swaps
``_decode_stub`` for a real decoder (PIL/ffmpeg) without touching the
pipeline shape (cf. reference's by-reference assets,
src/externalstorage/*).
"""

from __future__ import annotations

from ._util import read_parquet_clean

import pandas as pd


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _decode_stub(doc_id: int, n_chars: int) -> dict:
    """DETERMINISTIC FAKE decode: derives image-like metadata from the
    row's scalar columns (so the SQL oracle can reproduce it). A real
    decoder would parse the binary payload here and raise
    NotImplementedError on unsupported codecs."""
    return {
        "width": 640 + (n_chars % 1280),
        "height": 360 + (doc_id % 720),
        "n_frames": 1 + (doc_id % 24),
    }


class MediaDecoder:
    """Actor-pool decode stage: codec/model state loads once per actor
    (in production: PIL/libav contexts); per batch, decode and emit
    typed metadata. Small batch_size is the knob for large payloads."""

    def __init__(self) -> None:
        self.codec_ready = True  # stand-in for heavy codec init

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        metas = [
            _decode_stub(int(d), int(n)) for d, n in zip(df["doc_id"], df["n_chars"])
        ]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", df["doc_id"].to_numpy())
        return out


def media_frame_sample(sf_dir: str, every_n: int = 6, target_w: int = 256):
    """Composed multimodal chain: decode (actor pool, stubbed) →
    aspect-preserving resize → frame sampling (one output row per
    sampled frame, indices 0, n, 2n … < n_frames). The resize/sample
    arithmetic is integer-deterministic so the SQL oracle reproduces
    it; a real deployment swaps the decode stub only."""
    import numpy as np
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    decoded = ds.map_batches(
        MediaDecoder,
        batch_format="pandas",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )

    def resize_and_sample(df: pd.DataFrame) -> pd.DataFrame:
        w = df["width"].to_numpy(dtype=np.int64)
        h = df["height"].to_numpy(dtype=np.int64)
        nf = df["n_frames"].to_numpy(dtype=np.int64)
        out_h = np.floor(h * (target_w / 1.0) / w + 0.5).astype(np.int64)
        counts = -(-nf // every_n)  # ceil
        doc_rep = np.repeat(df["doc_id"].to_numpy(), counts)
        oh_rep = np.repeat(out_h, counts)
        # frame indices 0, every_n, … per doc
        idx_within = np.concatenate([np.arange(c, dtype=np.int64) for c in counts]) if len(counts) else np.zeros(0, np.int64)
        return pd.DataFrame(
            {
                "doc_id": doc_rep,
                "frame_idx": idx_within * every_n,
                "out_w": np.full(len(doc_rep), target_w, dtype=np.int64),
                "out_h": oh_rep,
            }
        )

    return decoded.map_batches(resize_and_sample, batch_format="pandas")


def media_features(sf_dir: str):
    """Decode-and-extract features over the corpus (documents rows stand
    in for media rows: doc_id + payload-size metadata)."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    return ds.map_batches(
        MediaDecoder,
        batch_format="pandas",
        batch_size=256,  # small batches: real payloads are MBs each
        concurrency=(1, 4),
        num_cpus=1,
    )
