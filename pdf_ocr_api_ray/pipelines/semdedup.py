"""SemDeDup — semantic deduplication over the embedding space
(Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication"; public arXiv 2303.09540).

The op the embedding family was missing: ``embedding_near_dup`` finds
*pairs* and ``knn_graph`` builds a neighbor graph, but the production
curation step is a *keep/drop verdict per vector* — cluster the corpus
with a coarse quantizer, then inside each cluster drop every vector
whose cosine to an already-kept (smaller ``vec_id``) member reaches the
threshold. Reference analogue: none (the reference has no embedding
ops at all); this extends SURVEY.md §2's "beyond the reference"
training-data block.

Scale shape (the SemDeDup design, stated honestly):

1. **Coarse quantizer** — the engine's bit-deterministic fixed-point
   distributed Lloyd trainer (``similarity._kmeans_centroids_distributed``,
   integer partial sums → centroids identical under any batch order or
   parallelism). Centroids broadcast once.
2. **Assignment** — a stateless scan: one float64 matmul per batch,
   ``argmax`` cell (ties → lowest cell id, same rule everywhere).
3. **Within-cluster leader dedup** — ONE ``groupby(cell)`` (the only
   exchange; it carries ``(vec_id, cell, embedding)``). Each cluster
   is scanned in ascending ``vec_id`` order: a vector is DROPPED iff
   its quantized cosine (``round(sim, 9)`` — the engine-wide ulp-wash)
   to some already-KEPT member is ``>= tau``; its ``leader_id`` is the
   smallest such kept member. The verdict sequence is a pure function
   of the sorted cluster content, so output is independent of block
   layout and parallelism (pinned by the multi-file-layout test).

The per-cluster cost is O(m·kept·d) — SemDeDup's own contract: ``k``
scales with the corpus (k ≈ N / target_cluster_size, clusters of
~10⁴-10⁵ vectors at web scale), so ``m`` is bounded and the groupby
never materializes more than a cluster. The scan is chunked (one BLAS
GEMM per 1024-row chunk against the kept-leader buffer + one
chunk-internal GEMM), with only verdict bookkeeping at Python speed.

Like the sketch family and the perceptual hash, there is no SQL twin
(k-means + sequential leader scan are not expressible as a DuckDB
query); the op is pinned by an independent straight-line numpy
reference implementation of the same spec, planted-duplicate recovery,
and the layout-invariance test.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import read_parquet_clean
from .similarity import (
    _augment,
    _kmeans_centroids_distributed,
    _t,
)

SEMDEDUP_TAU = 0.95
SEMDEDUP_CELLS = 16
_CHUNK = 1024


def _leader_scan(vecs: np.ndarray, ids: np.ndarray, tau: float):
    """Sequential leader dedup over one cluster.

    ``vecs`` row-normalized float64, ``ids`` ascending. Returns
    ``(keep, leader)`` int64 arrays — ``leader[i]`` is the smallest
    kept vec_id with quantized cosine >= tau (self if kept).

    Chunked: similarities are computed as two GEMMs per chunk (chunk ×
    kept-leaders and chunk × chunk), so the Python-level loop does only
    O(1) index bookkeeping per row — no per-row BLAS calls, no per-row
    hashing. The kept-leader buffer is preallocated (append = row
    write, never a reallocation).
    """
    n, dim = vecs.shape
    keep = np.zeros(n, dtype=bool)
    leader = np.empty(n, dtype=np.int64)
    kbuf = np.empty((n, dim), dtype=np.float64)  # kept leaders, in order
    kidx = np.empty(n, dtype=np.int64)  # row index of each kept leader
    nk = 0
    for s in range(0, n, _CHUNK):
        chunk = vecs[s : s + _CHUNK]
        m = len(chunk)
        # chunk vs leaders kept in PRIOR chunks (all have smaller ids)
        prior = np.round(chunk @ kbuf[:nk].T, 9) if nk else None
        inner = np.round(chunk @ chunk.T, 9)
        nk_prior = nk
        for i in range(m):
            gi = s + i
            if prior is not None:
                hit = np.flatnonzero(prior[i] >= tau)
                if hit.size:
                    leader[gi] = ids[kidx[hit[0]]]
                    continue
            # leaders kept earlier INSIDE this chunk (ids still smaller:
            # the cluster is scanned in ascending vec_id order)
            loc = kidx[nk_prior:nk] - s
            if loc.size:
                hit = np.flatnonzero(inner[i, loc] >= tau)
                if hit.size:
                    leader[gi] = ids[loc[hit[0]] + s]
                    continue
            keep[gi] = True
            leader[gi] = ids[gi]
            kbuf[nk] = vecs[gi]
            kidx[nk] = gi
            nk += 1
    return keep.astype(np.int64), leader


def semantic_dedup(
    sf_dir: str,
    k: int = SEMDEDUP_CELLS,
    tau: float = SEMDEDUP_TAU,
    iters: int = 4,
):
    """Per-vector semantic keep/drop verdicts (SemDeDup).

    Output: one row per vector (planted duplicates included) —
    ``(vec_id, cell, keep, leader_id)``, all int64 (no float columns —
    hash-stable across summation orders).

    The corpus is augmented with the engine's deterministic planted
    duplicates (``similarity._augment``: an exact copy at
    ``vec_id + 100_000`` for every ``vec_id % 10 == 0``) so the op
    provably drops something on the duplicate-free synthetic corpus;
    a planted copy is bitwise-identical, lands in its original's cell,
    and resolves to ``keep=0, leader_id=original`` unless the original
    itself was deduped into an even smaller leader (in which case the
    copy chains to that same leader — verdicts depend only on the
    kept set, never on drop order).
    """
    import ray

    cents = _kmeans_centroids_distributed(sf_dir, k, iters)
    cents_ref = ray.put(cents)

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        _augment, batch_format="pandas"
    )

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(cents_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype("int64"),
                "cell": np.argmax(vecs @ c.T, axis=1).astype(np.int64),
                "embedding": df["embedding"],
            }
        )

    def dedup_cell(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id").reset_index(drop=True)
        vecs = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        keep, leader = _leader_scan(vecs, ids, tau)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cell": g["cell"].to_numpy(dtype=np.int64),
                "keep": keep,
                "leader_id": leader,
            }
        )

    return (
        ds.map_batches(assign, batch_format="pandas")
        .groupby("cell")
        .map_groups(dedup_cell, batch_format="pandas")
    )
