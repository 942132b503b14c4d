"""Persisted LSH near-dup index — build ONCE over the base corpus,
query every crawl increment against it with ZERO base-text rescan.

``dedup_incremental`` answers the exact-duplicate steady state; this
module answers the NEAR-duplicate one. Re-running MinHash+LSH over
100 TB of history per 1 TB increment is the cost the index removes:
the base's band rows (24 B each) and shingle-fingerprint blobs
(8 B/shingle) persist as partitioned parquet, and an increment query
is then

1. band rows for the increment only (one increment scan),
2. an inner hash-join against the persisted band table on
   ``(band_id, band_hash)`` → candidate (base, new) pairs — identities
   only, distinct-deduped in pair-hash buckets,
3. exact-Jaccard verification through the shared
   ``pairs.verify_jaccard_pairs`` exchange, with the BASE side's
   shingle sets served from the persisted fingerprint blobs (never
   from base text) and the NEW side's computed in the increment scan.

Recall is the LSH banding guarantee (32×2: P(miss | J ≥ 0.6) ≈ 2e-7)
and precision is exact (every candidate verified) — identical
semantics to ``dedup_minhash_lsh``, restricted to cross
(base × increment) pairs; the DuckDB twin computes those pairs from
first principles.

Index layout: ``index_dir/bands/*.parquet`` (doc_id, band_id,
band_hash), ``index_dir/fps/*.parquet`` (doc_id, blob),
``index_dir/manifest.json`` (signature parameters + doc count — a
query refuses an index built with different parameters)."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from . import pairs as verify
from ._util import clamped_join_partitions, distinct_pairs, read_parquet_clean
from .dedup import (
    JACCARD_THRESHOLD,
    N_BANDS,
    N_HASHES,
    _augmented_documents,
    _minhash_sig,
    _SC1,
    _shingle_hashes,
    _TOKEN_RE,
)


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _band_frame(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, band_id, band_hash) rows — the same signature/banding
    arithmetic as dedup_minhash_lsh (complete polynomial band fold)."""
    n = len(df)
    rows_per_band = N_HASHES // N_BANDS
    sig = np.empty((n, N_HASHES), dtype=np.uint64)
    for j, text in enumerate(df["text"]):
        sig[j] = _minhash_sig(_TOKEN_RE.findall(text or ""))
    bands = sig.reshape(n, N_BANDS, rows_per_band)
    bh_u = np.zeros((n, N_BANDS), dtype=np.uint64)
    for k in range(rows_per_band):
        bh_u = bh_u * _SC1 + bands[:, :, k]
    bh = bh_u.view(np.int64)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(df["doc_id"].to_numpy(dtype=np.int64), N_BANDS),
            "band_id": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
            "band_hash": bh.ravel(),
        }
    )


def _fp_frame(df: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, blob): each doc's unique shingle hashes as a uint64
    byte blob — the binary shape Arrow joins and parquet both take."""
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "blob": [
                _shingle_hashes(_TOKEN_RE.findall(t or "")).tobytes()
                for t in df["text"]
            ],
        }
    )


def _manifest() -> dict:
    return {"n_hashes": N_HASHES, "n_bands": N_BANDS, "version": 1}


def _index_docs(ds, index_dir: str) -> None:
    """Stream a (doc_id, text) Dataset's band rows + fingerprint blobs
    into the index dirs (write_parquet emits uniquely-named files, so
    successive calls accumulate — that IS the append mechanism)."""
    ds.map_batches(_band_frame, batch_format="pandas").write_parquet(
        os.path.join(index_dir, "bands")
    )
    ds.map_batches(_fp_frame, batch_format="pandas").write_parquet(
        os.path.join(index_dir, "fps")
    )


def build_neardup_index(sf_dir: str, index_dir: str) -> dict:
    """Index the base corpus (the original documents table). Returns
    the manifest. Both sub-tables stream straight to partitioned
    parquet — nothing corpus-sized touches the driver."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    os.makedirs(index_dir, exist_ok=True)
    _index_docs(ds, index_dir)
    man = _manifest()
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(man, f)
    return man


def append_to_neardup_index(index_dir: str, docs_path: str) -> None:
    """Admit an increment into the index — the production loop's second
    half: query an increment, keep its survivors, APPEND them so the
    NEXT increment dedups against base + everything admitted since.
    ``docs_path`` is any (doc_id, text) parquet. Append-only new files;
    no existing index file is rewritten (a concurrent reader sees
    either the old or the grown index, never a partial file)."""
    with open(os.path.join(index_dir, "manifest.json")) as f:
        if json.load(f) != _manifest():
            raise ValueError("index parameters do not match this engine")
    ds = read_parquet_clean(docs_path, columns=["doc_id", "text"])
    _index_docs(ds, index_dir)


def query_neardup_index(
    sf_dir: str,
    index_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    *,
    increment_path: str | None = None,
):
    """Near-dup (indexed, increment) pairs with confirmed exact Jaccard
    — the indexed side served entirely from the index. Output:
    (id_a=indexed, id_b=increment, jaccard).

    The default increment is the testdata stand-in (the augmented
    copies/mutants, ids >= 1M — what the SQL twin regenerates); pass
    ``increment_path`` to query any (doc_id, text) parquet instead
    (ids must be disjoint from indexed ids — id_a/id_b orientation is
    pair order ``a < b``)."""
    import ray.data as rd

    with open(os.path.join(index_dir, "manifest.json")) as f:
        man = json.load(f)
    if man != _manifest():
        raise ValueError(f"index parameters {man} != engine {_manifest()}")

    if increment_path is not None:
        newd = read_parquet_clean(increment_path, columns=["doc_id", "text"])
    else:
        newd = _augmented_documents(sf_dir, mutated=True).map_batches(
            lambda df: df[df["doc_id"] >= 1_000_000], batch_format="pandas"
        )

    new_bands = newd.map_batches(_band_frame, batch_format="pandas").map_batches(
        lambda df: df.rename(columns={"doc_id": "id_b"}), batch_format="pandas"
    )
    idx_bands = rd.read_parquet(os.path.join(index_dir, "bands")).map_batches(
        lambda df: df.rename(columns={"doc_id": "id_a"}), batch_format="pandas"
    )
    nparts = clamped_join_partitions(16)
    joined = new_bands.repartition(nparts).join(
        idx_bands.repartition(nparts),
        "inner",
        nparts,
        on=("band_id", "band_hash"),
    )
    cand = distinct_pairs(
        joined.map_batches(lambda df: df[["id_a", "id_b"]], batch_format="pandas")
    )

    def make_sets(members_ref):
        import ray

        def from_fps(t: pa.Table) -> pa.Table:
            members = ray.get(members_ref) if members_ref is not None else None
            ids, hh = [], []
            for doc_id, blob in zip(t["doc_id"].to_pylist(), t["blob"].to_pylist()):
                if members is not None and int(doc_id) not in members:
                    continue
                ids.append(int(doc_id))
                hh.append(np.frombuffer(blob, dtype=np.uint64))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "hashes": pa.array(hh, pa.list_(pa.uint64())),
                },
                schema=verify.SETS_SCHEMA,
            )

        def from_docs(t: pa.Table) -> pa.Table:
            members = ray.get(members_ref) if members_ref is not None else None
            ids, hh = [], []
            for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                if members is not None and int(doc_id) not in members:
                    continue
                ids.append(int(doc_id))
                hh.append(_shingle_hashes(_TOKEN_RE.findall(text or "")))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "hashes": pa.array(hh, pa.list_(pa.uint64())),
                },
                schema=verify.SETS_SCHEMA,
            )

        fps = rd.read_parquet(os.path.join(index_dir, "fps")).map_batches(
            from_fps, batch_format="pyarrow"
        )
        news = newd.map_batches(from_docs, batch_format="pyarrow")
        return fps.union(news)

    return verify.verify_jaccard_pairs(make_sets, cand, jaccard_threshold)


def neardup_index_roundtrip(sf_dir: str):
    """Build-then-query in one call (the oracle-gate wrapper — a real
    deployment builds once and queries per increment)."""
    import tempfile

    with tempfile.TemporaryDirectory(dir="/tmp") as d:
        build_neardup_index(sf_dir, d)
        return query_neardup_index(sf_dir, d).to_pandas()
