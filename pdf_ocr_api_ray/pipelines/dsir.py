"""DSIR — Data Selection via Importance Resampling (Xie, Santurkar,
Ma, Liang 2023, "Data Selection for Language Models via Importance
Resampling", NeurIPS; public arXiv 2302.03169). Select raw-corpus
documents whose hashed-n-gram feature distribution looks like a
high-quality TARGET corpus — the mixture-curation step the quality
heuristics don't cover (they score documents intrinsically; DSIR
scores them RELATIVE to a target distribution).

Deterministic target stand-in: documents with ``doc_id % TARGET_MOD
== 0`` form the synthetic target set (the ``decontaminate`` benchmark
rule precedent — in production the target is an external corpus like
Wikipedia); all other documents are the raw pool to be scored.

Algorithm (the paper's hashed n-gram variant, exactly):

1. **Features** — each document is a bag of hashed unigrams + bigrams:
   ``bucket = md5_64(gram) % B`` (``dedup._stable64``, stable across
   processes; B = 8192).
2. **Bucket LMs** — ONE `elementwise_fold` ADD over a per-batch
   (2, B+1) int64 array: row 0 = target bucket counts, row 1 = raw
   bucket counts, last column the gram totals. Driver receives one
   row; no keyed exchange (a B-key groupby would pay the fixed
   aggregator ramp this fold exists to avoid).
3. **Scoring scan** — the two count vectors broadcast once; per
   document the importance log-weight is ``Σ_i f_i · (log p̂_t[i] −
   log p̂_s[i])`` with add-α smoothing (α = 1). The per-document sum
   accumulates in the document's own FIXED gram order (unigrams then
   bigrams, text order), so the float64 result is bit-reproducible
   across any batch layout or parallelism — but ``log`` is libm territory, so like the sketch
   family this op has NO SQL twin and is pinned by an independent
   straight-line reference (engine-internal determinism is asserted by
   the layout-invariance test). ``keep = weight > 0``: the document
   is more target-like than raw-pool-like (the paper resamples with
   Gumbel noise; the deterministic positive-ratio rule is the
   reproducible variant — a noisy sampler can be layered on the
   returned weights).

Output: one row per RAW (non-target) document —
``(doc_id, n_grams, weight, keep)``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ._util import elementwise_fold, read_parquet_clean
from .curation import _flat_grams, _t

DSIR_B = 8192  # feature buckets
TARGET_MOD = 97  # doc_id % TARGET_MOD == 0 → target corpus
_ALPHA = 1.0  # add-α smoothing


def _bucket_counts(texts: pd.Series, B: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat (row_idx, bucket_id) arrays for a batch's unigram + bigram
    occurrences — vectorized: the gram explosion rides ``_flat_grams``
    and md5 runs once per DISTINCT gram (``np.unique`` + take), never
    per occurrence. Per document the occurrence order is all unigrams
    (text order) then all bigrams (text order) — the fixed order the
    per-doc float weight accumulation depends on."""
    texts = texts.fillna("")
    _, r1, g1 = _flat_grams(texts, 1)
    _, r2, g2 = _flat_grams(texts, 2)
    # bincount walks input order, so concatenating [all unigrams, all
    # bigrams] keeps each doc's accumulation order = its unigrams then
    # its bigrams — identical to a per-doc loop
    rows = np.concatenate([r1, r2])
    grams = np.concatenate([g1, g2])
    if not len(grams):
        return rows.astype(np.int64), np.empty(0, dtype=np.int64)
    inv, uniq = pd.factorize(grams)  # hash-based — no object-string sort
    ub = np.fromiter(
        (
            int.from_bytes(hashlib.md5(str(g).encode()).digest()[:8], "little") % B
            for g in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return rows.astype(np.int64), ub[inv]


def dsir_select(sf_dir: str, B: int = DSIR_B, target_mod: int = TARGET_MOD):
    """Importance weights + keep verdicts for every raw-pool document
    (see module docstring)."""
    import ray

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> np.ndarray:
        out = np.zeros((2, B + 1), dtype=np.int64)
        is_target = (df["doc_id"].to_numpy(dtype=np.int64) % target_mod) == 0
        rows, buckets = _bucket_counts(df["text"], B)
        if len(rows):
            side = (~is_target[rows]).astype(np.int64)  # 0 = target, 1 = raw
            np.add.at(out, (side, buckets), 1)
            out[0, B] = int((side == 0).sum())
            out[1, B] = int((side == 1).sum())
        return out

    counts = elementwise_fold(ds, partial, np.add, np.int64, (2, B + 1))
    n_t, n_s = float(counts[0, B]), float(counts[1, B])
    # smoothed log-probabilities, computed ONCE on the driver (so every
    # worker sees bit-identical tables)
    log_ratio = np.log((counts[0, :B] + _ALPHA) / (n_t + _ALPHA * B)) - np.log(
        (counts[1, :B] + _ALPHA) / (n_s + _ALPHA * B)
    )
    ratio_ref = ray.put(log_ratio)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lr = ray.get(ratio_ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        raw = (ids % target_mod) != 0
        sub = df[raw]
        rows, buckets = _bucket_counts(sub["text"], B)
        n = int(raw.sum())
        n_grams = np.bincount(rows, minlength=n).astype(np.int64)
        w = np.bincount(rows, weights=lr[buckets], minlength=n)
        return pd.DataFrame(
            {
                "doc_id": ids[raw],
                "n_grams": n_grams,
                "weight": np.round(w, 9),
                "keep": (w > 0).astype(np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")
