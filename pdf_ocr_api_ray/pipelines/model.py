"""Model-scoring stage — the actor-pool contract every GPU/classifier
step of a training-data pipeline uses (fastText-style quality filters,
toxicity classifiers, learned rerankers).

``neural_quality_score`` is a DETERMINISTIC stand-in for a learned
quality classifier (the sandbox has no model runtimes): seeded-PRNG
weights play the role of a checkpoint load, hashed char-bigram
histograms play the role of an embedding, and a two-layer tanh/sigmoid
head produces the score. The Ray-side plumbing is the real thing —
weights materialize ONCE PER ACTOR in ``__init__`` (the once-per-process
client pattern of the reference worker, processJob.js:12-17), batches
score vectorized in ``__call__``, and ``concurrency`` × ``batch_size``
bound peak memory. Swapping the stand-in for a real model is a
one-class change.

No SQL twin (float GEMMs; sketch-family precedent): pinned by a
straight-line numpy reference and a block-layout-invariance test —
every per-row result depends only on that row's bytes, so any batching
gives identical scores.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import read_parquet_clean
from ..stages.clients import RetryPolicy, call_with_retry

MODEL_SEED = 20240917
N_FEATURES = 64  # hashed char-bigram buckets
HIDDEN = 256


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _load_weights() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """The 'checkpoint load' — deterministic, built once per actor."""
    rng = np.random.default_rng(MODEL_SEED)
    w1 = rng.standard_normal((N_FEATURES, HIDDEN))
    b1 = rng.standard_normal(HIDDEN)
    w2 = rng.standard_normal(HIDDEN)
    return w1, b1, w2


def _featurize(texts: pd.Series) -> np.ndarray:
    """(rows, N_FEATURES) L1-normalized hashed char-bigram histogram —
    vectorized over the batch's concatenated UTF-8 bytes; cross-row
    byte pairs are masked out exactly like the n-gram kernels."""
    enc = [t.encode("utf-8") for t in texts.fillna("")]
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=len(enc))
    out = np.zeros((len(enc), N_FEATURES), dtype=np.float64)
    if lens.sum() == 0:
        return out
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8).astype(np.int64)
    row_idx = np.repeat(np.arange(len(enc), dtype=np.int64), lens)
    if len(flat) > 1:
        valid = row_idx[:-1] == row_idx[1:]
        h = (flat[:-1][valid] * 31 + flat[1:][valid]) % N_FEATURES
        rows = row_idx[:-1][valid]
        np.add.at(out, (rows, h), 1.0)
    sums = out.sum(axis=1, keepdims=True)
    np.divide(out, sums, out=out, where=sums > 0)
    return out


def score_frame(df: pd.DataFrame, weights) -> pd.DataFrame:
    """Pure scoring kernel (shared by the actor and the test reference):
    tanh hidden layer → sigmoid head, row-independent by construction."""
    w1, b1, w2 = weights
    feats = _featurize(df["text"])
    hidden = np.tanh(feats @ w1 + b1)
    # calibrated head: the zero-feature baseline (a weights-only
    # constant) centers the sigmoid so keep/drop straddles 0.5 —
    # still purely row-local
    baseline = float(np.tanh(b1) @ w2)
    logit = hidden @ w2 - baseline
    score = 1.0 / (1.0 + np.exp(-logit))
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"].astype("int64"),
            "model_score": score,
            "keep": score >= 0.5,
        }
    )


class DefaultQualityClient:
    """The stand-in 'model endpoint': checkpoint load at construction,
    vectorized scoring per call. A real serving client implements the
    same two-method surface (construct once, ``score(df, timeout_s=)``
    per batch) — see stages/clients.py for the injection contract."""

    def __init__(self):
        self.weights = _load_weights()

    def score(self, df: pd.DataFrame, timeout_s: float | None = None) -> pd.DataFrame:
        return score_frame(df, self.weights)


class QualityModel:
    """Callable-class stage for ``map_batches``: the scoring client is
    built in ``__init__`` (once per actor — the reference's
    once-per-process client, processJob.js:12-17) from an injectable
    factory, and every batch call runs under the stage's RetryPolicy
    (stages/clients.py). Swapping in a real model endpoint is a
    factory argument, not an engine edit."""

    def __init__(self, client_factory=None, retry=None):
        self.client = (client_factory or DefaultQualityClient)()
        self.retry = retry or RetryPolicy()

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        return call_with_retry(
            self.client.score, self.retry, df, timeout_s=self.retry.timeout_s
        )


def neural_quality_score(
    sf_dir: str,
    concurrency: int | None = None,
    batch_size: int = 512,
    client_factory=None,
    retry=None,
):
    """Score every document with the (stand-in) learned quality model
    on an actor pool. Output: ``(doc_id, model_score, keep)``.

    Scale shape: stateless-per-row compute behind a stateful-per-actor
    checkpoint — the canonical ``map_batches(Cls, concurrency=(1, N),
    batch_size=B)`` form; at 100 TB only the pool bound changes (and
    ``num_cpus``/``num_gpus`` per actor for a real model). The pool is
    AUTOSCALING with min=1: a fixed-size pool gang-reserves its CPUs
    and can starve the upstream read tasks into a deadlock on a small
    cluster (the engine's measured hash-shuffle aggregator lesson,
    BASELINE.md) — (1, N) keeps the read schedulable everywhere."""
    import ray

    if concurrency is None:
        concurrency = max(1, int(ray.cluster_resources().get("CPU", 4)) // 2)
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        QualityModel,
        batch_format="pandas",
        concurrency=(1, concurrency),
        batch_size=batch_size,
        # client + retry/timeout config ride the actor constructor —
        # the injection point for a real model endpoint
        fn_constructor_kwargs={"client_factory": client_factory, "retry": retry},
    )
