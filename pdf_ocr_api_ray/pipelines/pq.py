"""Product quantization over the embedding space (Jégou, Douze,
Schmid 2011, "Product Quantization for Nearest Neighbor Search",
IEEE TPAMI; public). The memory-bound scale path the ANN family was
missing: IVF/LSH prune *which* vectors a query touches, PQ shrinks
*each* vector — 64 float32 (256 B) → ``m`` uint8 codes (8 B at the
default geometry), so a 10⁹-vector index fits in RAM and the scan
becomes table lookups. Reference analogue: none (the reference has no
embedding ops); extends SURVEY.md §2's "beyond the reference" block.

Three surfaces:

- ``_pq_train`` — per-subspace Euclidean k-means codebooks, trained
  distributed with the engine's fixed-point discipline: vectors are
  row-normalized (the engine-wide cosine geometry — L2² on unit
  vectors is monotone with cosine), each batch assigns subvectors to
  their nearest code and accumulates per-(subspace, code) int64
  partial sums + counts quantized per VECTOR at 1e-9 (integer
  addition is associative, so codebooks are bit-identical under any
  batch order / parallelism). ALL ``m`` subspaces train in ONE
  ``elementwise_fold`` pass per Lloyd round — a single (m, ks, sub+1)
  ADD-merged array, driver receives one row per round (the keyed
  groupby alternative pays ~7 s of aggregator ramp per round — the
  measured motivation behind ``_util.elementwise_fold``).
- ``pq_encode`` — stateless encoding scan: codebooks broadcast once
  via ``ray.put``; per batch one (rows, ks) distance matrix per
  subspace, ``argmin`` code (ties → lowest code, numpy argmin), hex
  code string + per-vector reconstruction error (``round(·, 9)``,
  the engine-wide ulp-wash).
- ``ann_topk_pq`` — asymmetric-distance (ADC) top-k: per probe a
  (m, ks) lookup table of subquery-to-code distances; the corpus scan
  encodes each batch and sums table entries (pure fancy indexing — no
  per-row float math), per-block partial top-k, one (probe_id)
  groupby finalizes. Same output contract as ``ann_topk`` /
  ``ann_topk_lsh`` but APPROXIMATE by construction (quantization
  error reorders distant neighbors), so like the sketch family it has
  no SQL twin: it is pinned by planted-copy recovery, a recall@k gate
  against the straight-line exact reference, and ADC-parity with an
  independent numpy implementation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import elementwise_fold, read_parquet_clean
from .similarity import (
    _augment_probe_dups,
    _probe_matrix,
    _smallest_by_vec_id,
    _t,
)

PQ_M = 8  # subspaces
PQ_KS = 16  # codes per subspace
PQ_ITERS = 4
_Q = 1_000_000_000  # fixed-point unit (1e-9), the engine-wide discipline
TOP_K = 10


def _norm(vecs: np.ndarray) -> np.ndarray:
    return vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)


def _stack(df: pd.DataFrame) -> np.ndarray:
    return _norm(np.stack(df["embedding"].to_numpy()).astype(np.float64))


def _assign_codes(vecs: np.ndarray, books: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(codes uint8 (rows, m), per-subspace squared distances of the
    chosen code (rows, m)). Ties → lowest code (numpy argmin)."""
    m, ks, sub = books.shape
    n = len(vecs)
    codes = np.empty((n, m), dtype=np.uint8)
    dist = np.empty((n, m), dtype=np.float64)
    for j in range(m):
        x = vecs[:, j * sub : (j + 1) * sub]
        d = ((x[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=-1)
        a = np.argmin(d, axis=1)
        codes[:, j] = a
        dist[:, j] = d[np.arange(n), a]
    return codes, dist


def _pq_train(
    sf_dir: str, m: int = PQ_M, ks: int = PQ_KS, iters: int = PQ_ITERS
) -> np.ndarray:
    """Distributed per-subspace Lloyd; returns (m, ks, sub) float64
    codebooks, bit-deterministic under any parallelism. Init: the
    subvectors of the ``ks`` globally-smallest vec_ids (the engine's
    deterministic init rule). Empty codes keep their centroid."""
    import ray

    init = _smallest_by_vec_id(sf_dir, ks)
    vecs = _stack(init)
    dim = vecs.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.ascontiguousarray(
        vecs.reshape(ks, m, sub).transpose(1, 0, 2)
    ).astype(np.float64)

    # iterative consumer (one execution per Lloyd round): pin the read
    # in the spill-backed object store once — same rationale as
    # _kmeans_centroids_distributed; bit-identical results
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["embedding"]).materialize()

    for _ in range(iters):
        books_ref = ray.put(books)

        def partial(df: pd.DataFrame) -> np.ndarray:
            b = ray.get(books_ref)
            v = _stack(df)
            out = np.zeros((m, ks, sub + 1), dtype=np.int64)
            # quantize per VECTOR, then sum int64s — the rounding is
            # independent of batch boundaries and integer addition is
            # associative, so the fold total is partition-invariant
            q = np.floor(v * _Q + 0.5).astype(np.int64)
            codes, _ = _assign_codes(v, b)
            for j in range(m):
                np.add.at(out[j, :, :sub], codes[:, j], q[:, j * sub : (j + 1) * sub])
                np.add.at(out[j, :, sub], codes[:, j], 1)
            return out

        acc = elementwise_fold(ds, partial, np.add, np.int64, (m, ks, sub + 1))
        new = books.copy()
        counts = acc[:, :, sub]
        live = counts > 0
        new[live] = acc[:, :, :sub][live] / _Q / counts[live, None]
        books = new
    return books


def pq_encode(
    sf_dir: str, m: int = PQ_M, ks: int = PQ_KS, iters: int = PQ_ITERS
):
    """Per-vector PQ codes + reconstruction error over the embeddings
    table (planted duplicates excluded — this is the index-build op:
    one row per corpus vector). Output: ``(vec_id, codes, recon_err)``
    — ``codes`` a 2m-char hex string (one byte per subspace),
    ``recon_err`` the summed per-subspace squared distance rounded to
    9 decimals. Codebooks broadcast once; the scan is stateless."""
    import ray

    books = _pq_train(sf_dir, m, ks, iters)
    books_ref = ray.put(books)

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(books_ref)
        v = _stack(df)
        codes, dist = _assign_codes(v, b)
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].astype("int64"),
                "codes": [row.tobytes().hex() for row in codes],
                "recon_err": np.round(dist.sum(axis=1), 9),
            }
        )

    return ds.map_batches(encode, batch_format="pandas")


def ann_topk_pq(
    sf_dir: str, m: int = PQ_M, ks: int = PQ_KS, iters: int = PQ_ITERS
):
    """ADC top-k: approximate nearest neighbors per probe via code
    lookups. Corpus = embeddings + the planted probe copies
    (``similarity._augment_probe_dups`` — identical vectors encode to
    identical codes, so each probe's planted copies carry the minimum
    possible ADC distance and are recovered deterministically).
    Output: ``(probe_id, rank, neighbor_id)`` — ids + integer ranks
    only, hash-stable. Ties order by (distance, vec_id)."""
    import ray

    probe_ids, probes = _probe_matrix(sf_dir)
    books = _pq_train(sf_dir, m, ks, iters)
    sub = books.shape[2]
    # (n_probes, m, ks) lookup tables: ||q_sub - code||² per entry
    tabs = (
        (probes.reshape(len(probes), m, 1, sub) - books[None, :, :, :]) ** 2
    ).sum(axis=-1)
    tabs_ref = ray.put(np.round(tabs, 12))
    books_ref = ray.put(books)
    pid_arr = probe_ids.astype(np.int64)

    ds = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda df: _augment_probe_dups(df, pid_arr), batch_format="pandas"
    )

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(tabs_ref)
        b = ray.get(books_ref)
        v = _stack(df)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        codes, _ = _assign_codes(v, b)
        out = []
        cols = np.arange(m)
        for p in range(len(pid_arr)):
            # ADC distance: sum of table entries — fancy indexing only
            adc = t[p][cols, codes].sum(axis=1)
            mask = ids != pid_arr[p]  # exclude self
            cand_ids, cand_d = ids[mask], adc[mask]
            order = np.lexsort((cand_ids, cand_d))[:TOP_K]
            for i in order:
                out.append((int(pid_arr[p]), int(cand_ids[i]), float(cand_d[i])))
        return pd.DataFrame(out, columns=["probe_id", "neighbor_id", "adc"])

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["adc", "neighbor_id"]).head(TOP_K).reset_index(drop=True)
        return pd.DataFrame(
            {
                "probe_id": g["probe_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return partials.groupby("probe_id").map_groups(final_topk, batch_format="pandas")


def ann_topk_ivfpq(
    sf_dir: str,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = PQ_ITERS,
    n_probe_cells: int = 4,
):
    """IVF-PQ — the production retrieval index shape (FAISS's
    ``IVFx,PQy``; Jégou et al. 2011 §V): the IVF coarse quantizer
    prunes WHICH vectors a probe touches (only its ``n_probe_cells``
    nearest cells are scanned) and PQ codes shrink EACH comparison to
    table lookups. Composition of two already-pinned pieces — the
    sample-trained spherical coarse quantizer of ``ann_topk_ivf`` and
    the ADC machinery of ``ann_topk_pq`` — same corpus contract (the
    planted probe copies land in each probe's own nearest cell, so the
    planted top-k is recovered deterministically; tests also pin
    equality with flat ``ann_topk_pq`` on this corpus and layout
    invariance). Output: ``(probe_id, rank, neighbor_id)``."""
    import ray

    from .similarity import IVF_CELLS, IVF_SAMPLE, _kmeans_centroids

    probe_ids, probes = _probe_matrix(sf_dir)
    sample = _smallest_by_vec_id(sf_dir, IVF_SAMPLE)
    cents = _kmeans_centroids(_stack(sample), IVF_CELLS)
    books = _pq_train(sf_dir, m, ks, iters)
    sub = books.shape[2]
    tabs = (
        (probes.reshape(len(probes), m, 1, sub) - books[None, :, :, :]) ** 2
    ).sum(axis=-1)
    # per probe: its n_probe_cells nearest coarse cells (ties → cell id)
    probe_cells = np.argsort(-(probes @ cents.T), axis=1, kind="stable")[
        :, :n_probe_cells
    ]
    state_ref = ray.put((cents, books, np.round(tabs, 12), probe_cells))
    pid_arr = probe_ids.astype(np.int64)

    ds = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]
    ).map_batches(
        lambda df: _augment_probe_dups(df, pid_arr), batch_format="pandas"
    )

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        c, b, t, pcells = ray.get(state_ref)
        v = _stack(df)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        cells = np.argmax(v @ c.T, axis=1)
        codes, _ = _assign_codes(v, b)
        out = []
        cols = np.arange(m)
        for p in range(len(pid_arr)):
            mask = np.isin(cells, pcells[p]) & (ids != pid_arr[p])
            if not mask.any():
                continue
            adc = t[p][cols, codes[mask]].sum(axis=1)
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, adc))[:TOP_K]
            for i in order:
                out.append((int(pid_arr[p]), int(cand_ids[i]), float(adc[i])))
        return pd.DataFrame(out, columns=["probe_id", "neighbor_id", "adc"])

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["adc", "neighbor_id"]).head(TOP_K).reset_index(drop=True)
        return pd.DataFrame(
            {
                "probe_id": g["probe_id"].astype("int64"),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return partials.groupby("probe_id").map_groups(final_topk, batch_format="pandas")
