"""snapshot_diff: brute-force replay equality + structural invariants.

(The DuckDB FULL-OUTER-JOIN twin runs through the shared parity gate in
test_queries_vs_duckdb; this file pins the semantics independently.)
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"


def _reference_diff() -> pd.DataFrame:
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]).to_pandas()

    def h(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    old = {int(r.doc_id): h(r.text) for r in docs.itertuples()}
    new = {}
    for r in docs.itertuples():
        i, t = int(r.doc_id), r.text
        if i % 11 != 0:
            if i % 7 == 0:
                parts = t.split(None, 1)
                if parts:
                    first = t.lstrip()[: len(parts[0])]
                    # replicate the regex ^(\S+) -> '\1 \1' (no leading ws in testdata)
                    t2 = t.replace(parts[0], parts[0] + " " + parts[0], 1)
                else:
                    t2 = t
                new[i] = h(t2)
            else:
                new[i] = old[i]
        if i % 13 == 0:
            new[i + 3_000_000] = h("NEW " + t)
    rows = []
    for i in sorted(set(old) | set(new)):
        ho, hn = old.get(i, ""), new.get(i, "")
        if ho == hn:
            continue
        status = "added" if not ho else ("removed" if not hn else "changed")
        rows.append((i, status, ho, hn))
    return pd.DataFrame(rows, columns=["doc_id", "status", "old_md5", "new_md5"])


def test_snapshot_diff_matches_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.delta import snapshot_diff

    got = (
        snapshot_diff(SF_DIR)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)[
            ["doc_id", "status", "old_md5", "new_md5"]
        ]
    )
    want = _reference_diff()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_snapshot_diff_statuses_follow_the_moduli(ray_session):
    from pdf_ocr_api_ray.pipelines.delta import snapshot_diff

    got = snapshot_diff(SF_DIR).to_pandas()
    byid = got.set_index("doc_id")
    removed = byid[byid["status"] == "removed"]
    changed = byid[byid["status"] == "changed"]
    added = byid[byid["status"] == "added"]
    assert (removed.index % 11 == 0).all()
    assert (changed.index % 7 == 0).all() and (changed.index % 11 != 0).all()
    assert (added.index >= 3_000_000).all() and ((added.index - 3_000_000) % 13 == 0).all()
    # digests present exactly where the side exists
    assert (removed["new_md5"] == "").all() and (removed["old_md5"] != "").all()
    assert (added["old_md5"] == "").all() and (added["new_md5"] != "").all()
    assert (changed["old_md5"] != changed["new_md5"]).all()


def test_snapshot_diff_bucket_count_invariance(ray_session):
    from pdf_ocr_api_ray.pipelines.delta import snapshot_diff

    a = snapshot_diff(SF_DIR, num_buckets=256).to_pandas()
    b = snapshot_diff(SF_DIR, num_buckets=7).to_pandas()
    key = ["doc_id", "status", "old_md5", "new_md5"]
    pd.testing.assert_frame_equal(
        a.sort_values(key, ignore_index=True)[key],
        b.sort_values(key, ignore_index=True)[key],
    )
