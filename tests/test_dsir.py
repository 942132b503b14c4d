"""DSIR importance-resampling selection (pipelines/dsir.py) — pinned
by an independent straight-line reference of the same spec (no SQL
twin: libm log; sketch-family precedent), a planted corpus where
target-like and raw-like documents provably separate, and layout
invariance."""

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
B = 8192
TARGET_MOD = 97
TOKEN = re.compile(r"\S+")


def _grams(text):
    ts = TOKEN.findall(text or "")
    return ts + [ts[i] + " " + ts[i + 1] for i in range(len(ts) - 1)]


def _bucket(g):
    return int.from_bytes(hashlib.md5(g.encode()).digest()[:8], "little") % B


def _ref(docs: list[tuple[int, str]]) -> pd.DataFrame:
    """Straight-line spec: integer bucket counts per side, smoothed
    log-ratio table, per-doc weight summed in gram order (unigrams
    then bigrams — the same float64 add sequence as the engine's
    bincount, so equality is exact)."""
    counts = np.zeros((2, B), dtype=np.int64)
    totals = [0, 0]
    for did, text in docs:
        side = 0 if did % TARGET_MOD == 0 else 1
        for g in _grams(text):
            counts[side, _bucket(g)] += 1
            totals[side] += 1
    lr = np.log((counts[0] + 1.0) / (totals[0] + float(B))) - np.log(
        (counts[1] + 1.0) / (totals[1] + float(B))
    )
    rows = []
    for did, text in docs:
        if did % TARGET_MOD == 0:
            continue
        gs = _grams(text)
        w = 0.0
        for g in gs:
            w += lr[_bucket(g)]
        rows.append((did, len(gs), round(w, 9), int(w > 0)))
    return (
        pd.DataFrame(rows, columns=["doc_id", "n_grams", "weight", "keep"])
        .astype({"doc_id": "int64", "n_grams": "int64", "keep": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _run(sf_dir: str) -> pd.DataFrame:
    from pdf_ocr_api_ray.pipelines.dsir import dsir_select

    return (
        dsir_select(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _write_corpus(path, docs):
    path.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], type=pa.int64()),
                "text": pa.array([t for _, t in docs], type=pa.string()),
            }
        ),
        path / "documents.parquet",
    )


def test_dsir_matches_reference_on_real_corpus(ray_session):
    got = _run(SF)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    exp = _ref(list(zip(t["doc_id"], t["text"])))
    pd.testing.assert_frame_equal(got, exp, check_exact=True)
    # targets excluded from the output (6 of 500 ids are % 97 == 0)
    assert len(got) == 494
    assert not (got["doc_id"] % TARGET_MOD == 0).any()


# planted corpus: the target (ids 0, 97) speaks a distinctive
# vocabulary; raw doc 1 speaks it too (target-like), raw docs 2-4
# speak a disjoint raw-dominant vocabulary (source-like)
PLANTED = [
    (0, "quantum flux resonance entangled qubit lattice " * 4),
    (97, "quantum resonance qubit flux lattice entangled " * 4),
    (1, "quantum flux resonance qubit entangled lattice " * 3),
    (2, "mud brick straw kiln mortar trowel " * 5),
    (3, "brick mud trowel straw kiln mortar " * 5),
    (4, "straw kiln mud mortar brick trowel " * 5),
]


def test_dsir_separates_target_like_from_raw_like(ray_session, tmp_path):
    _write_corpus(tmp_path, PLANTED)
    got = _run(str(tmp_path)).set_index("doc_id")
    assert set(got.index) == {1, 2, 3, 4}
    # the target-vocabulary doc is kept, the raw-dominant docs dropped
    assert got.loc[1, "keep"] == 1 and got.loc[1, "weight"] > 0
    assert (got.loc[[2, 3, 4], "keep"] == 0).all()
    assert (got.loc[[2, 3, 4], "weight"] < 0).all()
    # and the engine agrees with the reference bit-for-bit here too
    pd.testing.assert_frame_equal(
        got.reset_index(), _ref(PLANTED), check_exact=True
    )


def test_dsir_layout_invariant(ray_session, tmp_path):
    """Bucket counts fold associatively and scoring is per-row —
    identical output for 1-file and 3-file layouts."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    one = tmp_path / "one"
    (one / "documents.parquet").mkdir(parents=True)
    pq.write_table(t, one / "documents.parquet" / "a.parquet")
    three = tmp_path / "three"
    (three / "documents.parquet").mkdir(parents=True)
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), three / "documents.parquet" / f"p{i}.parquet")
    a = _run(str(one))
    b = _run(str(three))
    pd.testing.assert_frame_equal(a, b, check_exact=True)
