"""Snapshot diff / change-data-capture between two corpus versions.

Production shape: a crawl refresh lands as a new snapshot of the
documents table and downstream training-data jobs need the delta —
which docs were added, removed, or changed — without re-processing the
unchanged bulk (the same steady-state motivation as
``dedup.dedup_incremental``: you do not rescan 100 TB of history to
admit a refresh). Reference analogue: the job-state store's
new-vs-known-job distinction (`/root/reference/worker/processJob.js`
re-processes only jobs not already in state), generalized to
table-level change capture.

Synthetic "new snapshot" (deterministic, SQL-replayable — the twin in
``__ray_entry__.oracle_sql()`` regenerates it with identical
arithmetic): starting from ``documents``,

- **removed**: ``doc_id % 11 == 0`` rows are absent from the new
  snapshot;
- **changed**: surviving ``doc_id % 7 == 0`` rows have their first
  token doubled (the ``dedup._augmented_documents`` mutation);
- **added**: every ``doc_id % 13 == 0`` row also appears as a brand-new
  doc at ``doc_id + 3_000_000`` with ``'NEW ' || text``.

Scale design: ONE text scan total — both sides' content digests are
computed inside the scan (text never enters the exchange), and the
diff itself is the union+groupby co-location idiom over slim
``(doc_id, side, md5-hex)`` rows: one doc_id-bucketed keyed exchange,
each bucket classifying its ids with a vectorized pandas merge.
Unchanged docs are dropped inside the bucket, so the output is bounded
by the churn, not the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ._util import read_parquet_clean


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _md5_hex(texts: pd.Series) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def snapshot_diff(sf_dir: str, num_buckets: int = 256):
    """Change capture old→new snapshot. Output: one row per non-identical
    doc_id — ``(doc_id, status ∈ {added, removed, changed}, old_md5,
    new_md5)`` with ``''`` standing in for the absent side (not NULL, so
    the driver's stringified value hash is stable)."""

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def digest_sides(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        old_h = np.asarray(_md5_hex(df["text"]), dtype=object)
        frames = [pd.DataFrame({"doc_id": ids, "side": np.int64(0), "h": old_h})]

        keep = ids % 11 != 0
        kept = df[keep]
        kept_ids = ids[keep]
        mut_mask = kept_ids % 7 == 0
        new_text = kept["text"].copy()
        if mut_mask.any():
            new_text[mut_mask] = new_text[mut_mask].str.replace(
                r"^(\S+)", r"\1 \1", regex=True, n=1
            )
        # digests for surviving rows: unmutated rows reuse the old
        # digest (same bytes — no second md5 pass over the bulk)
        new_h = old_h[keep].copy()
        if mut_mask.any():
            new_h[mut_mask] = np.asarray(_md5_hex(new_text[mut_mask]), dtype=object)
        frames.append(pd.DataFrame({"doc_id": kept_ids, "side": np.int64(1), "h": new_h}))

        add_mask = ids % 13 == 0
        if add_mask.any():
            added = "NEW " + df["text"][add_mask]
            frames.append(
                pd.DataFrame(
                    {
                        "doc_id": ids[add_mask] + 3_000_000,
                        "side": np.int64(1),
                        "h": np.asarray(_md5_hex(added), dtype=object),
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        out["b"] = (out["doc_id"].to_numpy(np.uint64) * np.uint64(0x9E3779B9)) % num_buckets
        return out

    def classify(group: pd.DataFrame) -> pd.DataFrame:
        old = group[group["side"] == 0][["doc_id", "h"]]
        new = group[group["side"] == 1][["doc_id", "h"]]
        m = old.merge(new, on="doc_id", how="outer", suffixes=("_old", "_new"))
        h_old = m["h_old"].fillna("")
        h_new = m["h_new"].fillna("")
        status = np.where(
            h_old == "", "added", np.where(h_new == "", "removed", "changed")
        )
        out = pd.DataFrame(
            {
                "doc_id": m["doc_id"].astype(np.int64),
                "status": status,
                "old_md5": h_old,
                "new_md5": h_new,
            }
        )
        # unchanged docs (identical digests) leave the pipeline here —
        # the exchange paid slim digest rows; the OUTPUT pays only churn
        return out[h_old.to_numpy() != h_new.to_numpy()]

    return (
        ds.map_batches(digest_sides, batch_format="pandas")
        .groupby("b")
        .map_groups(classify, batch_format="pandas")
    )
