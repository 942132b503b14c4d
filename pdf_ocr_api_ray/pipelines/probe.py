"""Distributed one-vs-rest ridge linear probe over the embedding
table — the classifier-based quality/domain filtering stage of the
canonical LLM curation pipelines (GPT-3's LR quality classifier,
Brown et al. 2020 §A; LLaMA's Wikipedia-reference classifier, Touvron
et al. 2023 — both public), and the standard "linear probe" embedding
eval (Alain & Bengio 2016). Reference analogue: none (the reference
has no embedding ops); extends SURVEY.md §2's "beyond the reference"
training-data block alongside ``embedding_pca``.

Shape — the ``embedding_pca`` discipline applied to supervised
training: everything the closed-form ridge solution needs is one
global Gram matrix of the 1-augmented, label-one-hot-augmented block
``B = [q, 1, onehot(label)]`` over the TRAIN split, so the whole
training pass rides ONE ``elementwise_fold``:

- ``BᵀB`` carries ``XᵀX`` (scale PROBE_Q²), ``Σx`` / ``Xᵀonehot``
  (scale PROBE_Q), the train-row count and per-class counts (scale 1)
  in a single ``(d+1+C, d+1+C)`` int64 array whose ADD-merge is
  associative ⇒ the trained weights, and every downstream double, are
  bit-identical under any batch order / parallelism;
- train membership is the engine's drift-free md5 draw on ``vec_id``
  (the ``split_corpus`` rule): a pure function of the id, so the
  split — and therefore the probe — never moves with layout, resume,
  or corpus growth;
- the driver (and only the driver) does the O(d³ + d²C) finish: per
  class solve ``(XaᵀXa + λ·diag(1..1,0)) w_c = Xaᵀ y_c`` (intercept
  unregularized, the textbook convention);
- a stateless scoring scan broadcasts the (d+1, C) weight matrix in
  the task closure and emits one row per vector (train AND held-out):
  per-class scores are ulp-washed to ``round(·, 9)``, prediction is
  argmax over classes OBSERVED in training (ties → lowest class id).

int64 headroom is asserted, not assumed: the parquet row count fixes
``QBOUND = floor(sqrt(2⁶² / n))`` before the fold and every batch
rejects components outside it (one-hot columns only lower the block's
magnitudes, so the PCA bound covers the augmented Gram too). Labels
must lie in ``[0, PROBE_LABEL_CAP)`` — asserted per batch; widen the
cap for wider label spaces (the fold grows as (d+1+C)²).

No SQL twin (a matrix solve), like the PCA/sketch/PQ families —
pinned by the straight-line numpy replay, planted-separable recovery,
single-class and degenerate edges, the overflow guard, and layout
invariance in tests/test_probe.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ._util import elementwise_fold, read_parquet_clean

PROBE_Q = 1 << 20  # fixed-point unit for the Gram fold (PCA_Q twin)
PROBE_LABEL_CAP = 32  # one-hot width; labels must be in [0, cap)
PROBE_LAMBDA = 1.0  # ridge strength (intercept unregularized)
PROBE_SALT = "probe"  # md5 split salt (drift-free train membership)
PROBE_TRAIN_PCT = 80  # draw % that lands in the train split


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _train_mask(vec_ids: np.ndarray) -> np.ndarray:
    """Drift-free membership: md5 draw mod 100 < PROBE_TRAIN_PCT —
    the split_corpus arithmetic with the probe's own salt. A pure
    function of vec_id: identical across runs, layouts, and growth."""
    draws = np.fromiter(
        (
            int.from_bytes(
                hashlib.md5(f"{PROBE_SALT}|{int(v)}".encode()).digest()[:8],
                "little",
            )
            & 0xFFFFFFFF
            for v in vec_ids
        ),
        dtype=np.int64,
        count=len(vec_ids),
    )
    return (draws % 100) < PROBE_TRAIN_PCT


def _quantize(df: pd.DataFrame, qbound: int) -> np.ndarray:
    x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(x * PROBE_Q + 0.5).astype(np.int64)
    if len(q) and np.abs(q).max() > qbound:
        raise OverflowError(
            "quality_probe: component magnitude exceeds the int64-safe "
            f"range for this row count (|x| > {qbound / PROBE_Q:.4f}) — "
            "shrink PROBE_Q"
        )
    return q


def _block(df: pd.DataFrame, qbound: int, cap: int, dim: int) -> np.ndarray:
    """Train-rows-only 1-augmented one-hot-augmented int64 block."""
    ids = df["vec_id"].to_numpy(np.int64)
    keep = _train_mask(ids)
    labels = df["label"].to_numpy(np.int64)[keep]
    if len(labels) and (labels.min() < 0 or labels.max() >= cap):
        raise ValueError(
            f"quality_probe: labels must lie in [0, {cap}) — widen "
            "PROBE_LABEL_CAP for wider label spaces"
        )
    if not keep.any():  # a batch whose rows all drew held-out
        return np.zeros((0, dim + 1 + cap), dtype=np.int64)
    q = _quantize(df[keep], qbound)
    n = len(q)
    onehot = np.zeros((n, cap), dtype=np.int64)
    onehot[np.arange(n), labels] = 1
    return np.concatenate(
        [q, np.ones((n, 1), dtype=np.int64), onehot], axis=1
    )


def _weights_from_gram(
    gram: np.ndarray, dim: int, cap: int, lam: float
) -> tuple[np.ndarray, np.ndarray]:
    """Driver finish: exact ints → per-class ridge solve. Returns
    ``(W, classes)`` — W is (d+1, C_present) in FLOAT units, classes
    the ascending observed class ids."""
    da = dim + 1
    counts = np.diag(gram)[da:].astype(np.int64)  # per-class train counts
    n = int(gram[dim, dim])
    if n == 0:
        raise ValueError("quality_probe: empty train split")
    classes = np.flatnonzero(counts > 0)
    # de-quantize the mixed-scale blocks: q·q → Q², q·1 and q·y → Q,
    # 1·1 and 1·y → 1 (exact ints in, one float division each)
    xtx = gram[:da, :da].astype(np.float64)
    xtx[:dim, :dim] /= float(PROBE_Q) * PROBE_Q
    xtx[:dim, dim] /= PROBE_Q
    xtx[dim, :dim] /= PROBE_Q
    xty = gram[:da, da:][:, classes].astype(np.float64)
    xty[:dim] /= PROBE_Q
    reg = np.eye(da) * lam
    reg[dim, dim] = 0.0  # intercept unregularized
    w = np.linalg.solve(xtx + reg, xty)  # (d+1, C_present)
    return w, classes


def quality_probe(
    sf_dir: str,
    lam: float = PROBE_LAMBDA,
    label_cap: int = PROBE_LABEL_CAP,
):
    """One row per vector (train AND held-out):
    ``(vec_id, label, is_train, pred, score)`` where ``pred`` is the
    argmax class over the ulp-washed per-class scores (ties → lowest
    observed class id) and ``score`` its ``round(·, 9)`` margin. Two
    scans total — the train-split Gram fold and the scoring scan;
    nothing vector-scale ever reaches the driver."""
    from ._util import embedding_table_meta

    path = _t(sf_dir, "embeddings")
    n_rows, dim = embedding_table_meta(path)
    if n_rows == 0:
        raise ValueError("quality_probe: empty embeddings table")
    qbound = int(np.sqrt(2**62 / n_rows))
    side = dim + 1 + label_cap

    ds = read_parquet_clean(path, columns=["vec_id", "embedding", "label"])

    def per_batch(df: pd.DataFrame) -> np.ndarray:
        if not len(df):
            return np.zeros((side, side), dtype=np.int64)
        b = _block(df, qbound, label_cap, dim)
        return b.T @ b

    gram = elementwise_fold(ds, per_batch, np.add, np.int64, (side, side))
    w, classes = _weights_from_gram(gram, dim, label_cap, lam)
    w_c = np.ascontiguousarray(w)
    classes_c = classes.astype(np.int64)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        if len(df):
            x = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            xa = np.concatenate([x, np.ones((len(x), 1))], axis=1)
            scores = np.round(xa @ w_c, 9)  # engine-wide ulp-wash
            best = np.argmax(scores, axis=1)  # lowest index on ties
            pred = classes_c[best]
            margin = scores[np.arange(len(x)), best]
        else:
            pred = np.zeros(0, dtype=np.int64)
            margin = np.zeros(0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "label": df["label"].to_numpy(np.int64),
                "is_train": _train_mask(ids).astype(np.int64),
                "pred": pred,
                "score": margin,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def probe_reference(
    vecs: np.ndarray,
    vec_ids: np.ndarray,
    labels: np.ndarray,
    lam: float = PROBE_LAMBDA,
    label_cap: int = PROBE_LABEL_CAP,
) -> pd.DataFrame:
    """Straight-line numpy replay of the distributed arithmetic (test
    anchor): identical split, quantization, one exact integer Gram,
    the same driver solve and scoring."""
    qbound = int(np.sqrt(2**62 / max(len(vecs), 1)))
    df = pd.DataFrame(
        {
            "vec_id": vec_ids.astype(np.int64),
            "embedding": list(vecs),
            "label": labels.astype(np.int64),
        }
    )
    b = _block(df, qbound, label_cap, vecs.shape[1])
    gram = b.T @ b
    w, classes = _weights_from_gram(gram, vecs.shape[1], label_cap, lam)
    xa = np.concatenate([vecs.astype(np.float64), np.ones((len(vecs), 1))], axis=1)
    scores = np.round(xa @ w, 9)
    best = np.argmax(scores, axis=1)
    return pd.DataFrame(
        {
            "vec_id": df["vec_id"],
            "label": df["label"],
            "is_train": _train_mask(df["vec_id"].to_numpy(np.int64)).astype(np.int64),
            "pred": classes.astype(np.int64)[best],
            "score": scores[np.arange(len(vecs)), best],
        }
    )
