"""Distributed exact-integer PCA over the embedding table — the
dimensionality-reduction stage retrieval pipelines run before PQ/IVF
(FAISS's ``PCAMatrix`` pre-transform; Jolliffe, "Principal Component
Analysis", public) and the standard whitening/visualization step for
embedding-quality audits. Reference analogue: none (the reference has
no embedding ops); extends SURVEY.md §2's "beyond the reference" block.

Shape: PCA needs exactly one global (d+1, d+1) Gram matrix — tiny,
fixed-size state — so the whole reduction rides ONE
``elementwise_fold`` pass (scan-dominated; the keyed-groupby
alternative pays the measured ~7 s aggregator ramp for nothing):

- per batch, components quantize to int64 at ``1/PCA_Q`` and the
  1-augmented block computes ``Qa^T Qa`` — carrying ``sum q_i q_j``,
  ``sum q_i`` and ``n`` in one integer array whose ADD-merge is
  associative ⇒ the fold result, and therefore every downstream
  double, is bit-identical under any batch order / parallelism;
- the driver (and only the driver) does the O(d³) work: exact integer
  sums → covariance → ``eigh`` → top-k components with a
  deterministic sign convention (each component's largest-|·| entry
  is made positive, ties → lowest index);
- a stateless projection scan broadcasts the (d, k) component matrix
  in the task closure (a few KB) and emits ``(vec_id, pc0..pc{k-1})``
  — row-local GEMV, no shuffle.

int64 headroom is ASSERTED, not assumed (the engine-wide discipline):
the parquet-metadata row count fixes a per-component bound
``QBOUND = floor(sqrt(2⁶² / n))`` BEFORE the fold and every batch
rejects components outside it — so ``|Σ q_i q_j| ≤ n × QBOUND² < 2⁶²``
holds for any merge tree, by construction. Unit-scale embeddings
(|x| ≤ 0.5) stay inside the bound up to n = 2²⁴ ≈ 1.7×10⁷ vectors at
the default ``PCA_Q`` (each halving of ``PCA_Q`` buys 4×n); the documented remedy past it is shrinking
``PCA_Q`` (covariance averages quantization noise away) or two-limb
hi/lo accumulation — both change constants, not the shape.

No SQL twin (eigendecomposition), like the sketch/PQ families — pinned
by the straight-line numpy reference, planted-structure recovery, and
degenerate-input tests in tests/test_pca.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import elementwise_fold, read_parquet_clean

PCA_Q = 1 << 20  # fixed-point unit for the Gram fold
PCA_K = 4  # components kept


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _quantize(df: pd.DataFrame, qbound: int) -> np.ndarray:
    """(rows, d) int64 fixed-point components, range-asserted against
    the n-derived bound that makes the whole fold overflow-free."""
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(x * PCA_Q + 0.5).astype(np.int64)
    if len(q) and np.abs(q).max() > qbound:
        raise OverflowError(
            "embedding_pca: component magnitude exceeds the int64-safe "
            f"range for this row count (|x| > {qbound / PCA_Q:.4f}) — "
            "shrink PCA_Q"
        )
    return q


def _fold_gram(ds, dim: int, qbound: int) -> np.ndarray:
    """ONE distributed pass → exact int64 [[Σqqᵀ, Σq], [Σqᵀ, n]]."""

    def per_batch(df: pd.DataFrame) -> np.ndarray:
        out = np.zeros((dim + 1, dim + 1), dtype=np.int64)
        if not len(df):
            return out
        q = _quantize(df, qbound)
        qa = np.concatenate([q, np.ones((len(q), 1), dtype=np.int64)], axis=1)
        return qa.T @ qa

    return elementwise_fold(ds, per_batch, np.add, np.int64, (dim + 1, dim + 1))


def _components_from_gram(gram: np.ndarray, k: int):
    """Driver-side O(d³) finish: exact ints → covariance → eigh →
    sign-fixed top-k components + explained-variance ratios."""
    n = int(gram[-1, -1])
    if n == 0:
        raise ValueError("embedding_pca: empty embeddings table")
    s1 = gram[:-1, -1].astype(np.float64)  # Σq
    s2 = gram[:-1, :-1].astype(np.float64)  # Σqqᵀ
    mean_q = s1 / n
    cov = (s2 / n - np.outer(mean_q, mean_q)) / (PCA_Q * PCA_Q)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]  # (d, k)
    # deterministic sign: the largest-|·| entry of each component is
    # positive; np.argmax takes the LOWEST index on ties
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    total = float(np.trace(cov))
    evr = (
        evals[order] / total if total > 0 else np.zeros(len(order), dtype=np.float64)
    )
    return comps, evr, mean_q / PCA_Q


def embedding_pca(sf_dir: str, k: int = PCA_K):
    """Top-``k`` principal-component scores per vector:
    ``(vec_id, pc0..pc{k-1})`` with scores ``round(·, 9)`` (the
    engine-wide ulp-wash). Two scans total: the Gram fold and the
    projection; nothing vector-scale ever reaches the driver."""
    from ._util import embedding_table_meta

    path = _t(sf_dir, "embeddings")
    n_rows, dim = embedding_table_meta(path)
    if n_rows == 0:
        raise ValueError("embedding_pca: empty embeddings table")
    # n × QBOUND² < 2⁶² for any merge tree, by construction; batches
    # assert |q| ≤ QBOUND (see module docstring for the boundary)
    qbound = int(np.sqrt(2**62 / n_rows))

    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])
    gram = _fold_gram(ds, dim, qbound)
    comps, _evr, _mean = _components_from_gram(gram, k)
    comps_c = np.ascontiguousarray(comps)

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = {"vec_id": df["vec_id"].to_numpy(np.int64)}
        if len(df):
            x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            scores = np.round(x @ comps_c, 9)
        else:
            scores = np.zeros((0, comps_c.shape[1]))
        for j in range(comps_c.shape[1]):
            out[f"pc{j}"] = scores[:, j]
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")


def pca_reference(vecs: np.ndarray, k: int = PCA_K):
    """Straight-line numpy replay of the distributed arithmetic (test
    anchor): identical quantization, one exact integer Gram, the same
    driver finish. Returns (scores, components, evr)."""
    qbound = int(np.sqrt(2**62 / max(len(vecs), 1)))
    q = _quantize(pd.DataFrame({"embedding": list(vecs)}), qbound)
    qa = np.concatenate([q, np.ones((len(q), 1), dtype=np.int64)], axis=1)
    gram = qa.T @ qa
    comps, evr, _mean = _components_from_gram(gram, k)
    return np.round(vecs.astype(np.float64) @ comps, 9), comps, evr
