"""Per-dimension symmetric int8 scalar quantization of the embedding
table — the storage/serving compression every billion-vector corpus
applies before ANN (FAISS ``SQ8``; 4× smaller than float32, and the
usual companion to the IVF/PQ paths in ``pipelines/similarity.py`` /
``pipelines/pq.py``: SQ8 keeps per-dim resolution where PQ trades it
for 8× more compression).

Fixed-point discipline (the engine-wide rule that makes float ops
hash-verifiable): element values quantize to exact int64 micro-units
first (``floor(float64(v)·1e6 + 0.5)`` — identical IEEE doubles in
numpy and DuckDB), and EVERYTHING after is integer arithmetic:

- per-dim scale: ``A_d = max(|v_u|)`` over the corpus, computed as ONE
  d-long ``elementwise_fold`` MAX row — no shuffle, the driver receives
  one (d,) vector regardless of block count;
- code: ``round_half_up(|v_u|·127 / A_d)`` with the sign reattached,
  exactly ``(|v_u|·254 + A_d) // (2·A_d)`` in int64 (codes ∈ [-127,127];
  A_d = 0 ⇒ dead dimension ⇒ code 0);
- reconstruction: ``round_half_up(|c|·A_d / 127) = (2·|c|·A_d + 127) // 254``
  micro-units; ``max_err_u`` is the vector's worst absolute error.

The scales broadcast once via ``ray.put``; encoding is a stateless
single scan. Output: ``(vec_id, n_dims, codes, max_err_u)`` with codes
the ','-joined int8 values in dimension order — byte-comparable to the
SQL twin's ordered ``string_agg``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ._util import elementwise_fold, embedding_table_meta, read_parquet_clean


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _micro_units(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    ids = df["vec_id"].to_numpy(np.int64)
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    return ids, np.floor(mat * 1e6 + 0.5).astype(np.int64)


def quantize_embeddings(sf_dir: str):
    import ray

    path = _t(sf_dir, "embeddings")
    _, dim = embedding_table_meta(path)
    ds = read_parquet_clean(path, columns=["vec_id", "embedding"])

    def per_batch_max(df: pd.DataFrame) -> np.ndarray:
        if not len(df):
            return np.zeros(dim, dtype=np.int64)
        _, vu = _micro_units(df)
        return np.abs(vu).max(axis=0)

    amax = elementwise_fold(ds, per_batch_max, np.maximum, np.int64, (dim,))
    amax_ref = ray.put(amax)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        a = ray.get(amax_ref)
        ids, vu = _micro_units(df)
        av = np.abs(vu)
        safe = np.maximum(a, 1)  # A_d = 0 dims produce code 0 via the mask
        code = (av * 254 + safe) // (2 * safe)
        code = np.where(a > 0, code, 0) * np.sign(vu)
        recon = np.where(a > 0, (2 * np.abs(code) * safe + 127) // 254, 0) * np.sign(
            code
        )
        err = np.abs(vu - recon).max(axis=1)
        codes_str = ["," .join(map(str, row)) for row in code]
        return pd.DataFrame(
            {
                "vec_id": ids,
                "n_dims": np.full(len(ids), vu.shape[1], dtype=np.int64),
                "codes": codes_str,
                "max_err_u": err.astype(np.int64),
            }
        )

    return ds.map_batches(encode, batch_format="pandas")
