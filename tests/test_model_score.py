"""Actor-pool model scoring (model.neural_quality_score) — ROWS_ONLY
op (float GEMMs, no SQL twin): pinned against the shared straight-line
kernel run driver-side, plus block-layout invariance (per-row results
depend only on that row's bytes)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq


def _run(sf_dir, **kw):
    from pdf_ocr_api_ray.pipelines.model import neural_quality_score

    return (
        neural_quality_score(sf_dir, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_matches_straight_line_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.model import _load_weights, score_frame

    sf = "/root/testdata/sf0.001"
    got = _run(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    exp = (
        score_frame(docs, _load_weights())
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert (got["doc_id"].to_numpy() == exp["doc_id"].to_numpy()).all()
    assert (got["model_score"].to_numpy() == exp["model_score"].to_numpy()).all()
    assert (got["keep"].to_numpy() == exp["keep"].to_numpy()).all()
    # scores are non-degenerate: both classes occur on the real corpus
    assert 0 < got["keep"].sum() < len(got)


def test_batch_layout_invariance(ray_session):
    a = _run("/root/testdata/sf0.001", concurrency=1, batch_size=17)
    b = _run("/root/testdata/sf0.001", concurrency=2, batch_size=512)
    pd.testing.assert_frame_equal(a, b)


def test_empty_and_null_text(ray_session, tmp_path):
    import pyarrow as pa

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["", None], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = _run(str(tmp_path))
    # zero feature vector → bias-only logit, same for both rows
    assert got["model_score"].nunique() == 1
    assert np.isfinite(got["model_score"]).all()
