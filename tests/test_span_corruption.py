"""T5-style span corruption (prep.span_corruption) — pinned against an
independent straight-line reference replaying the md5 rule, plus the
SQL twin via the rotated_out parity gate."""

import hashlib
import re

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

STRIDE, PCT, MAXLEN = 8, 40, 3


def _ref_one(doc_id: int, text: str):
    tk = re.findall(r"\S+", text or "")
    spans = []
    for a in range(0, len(tk), STRIDE):
        h = hashlib.md5(f"corrupt|{doc_id}|{a}".encode()).digest()
        if int.from_bytes(h[:8], "little") % 100 < PCT:
            ln = int.from_bytes(h[8:16], "little") % MAXLEN + 1
            spans.append((a, min(a + ln, len(tk))))
    covered = set()
    for a, e in spans:
        covered.update(range(a, e))
    inp, tgt = [], []
    for k, (a, e) in enumerate(spans):
        tgt.append(f"<extra_id_{k}>")
        tgt.extend(tk[a:e])
    k = 0
    i = 0
    while i < len(tk):
        if i in covered:
            if any(a == i for a, _ in spans):
                inp.append(f"<extra_id_{k}>")
                k += 1
            i += 1
        else:
            inp.append(tk[i])
            i += 1
    return {
        "doc_id": doc_id,
        "n_tokens": len(tk),
        "n_spans": len(spans),
        "n_masked": len(covered),
        "input_text": " ".join(inp),
        "target_text": " ".join(tgt),
    }


def _write(path, docs):
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


def _run(sf_dir):
    from pdf_ocr_api_ray.pipelines.prep import span_corruption

    return (
        span_corruption(sf_dir)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_matches_straight_line_reference(ray_session, tmp_path):
    docs = [
        (1, " ".join(f"w{i}" for i in range(40))),  # several anchors
        (2, "a b c"),  # single anchor, clip at doc end
        (3, ""),  # token-less
        (4, None),  # null text
        (5, " ".join(f"t{i}" for i in range(17))),  # anchor at last pos
    ]
    _write(tmp_path, docs)
    got = _run(str(tmp_path))
    exp = (
        pd.DataFrame([_ref_one(d, t) for d, t in docs])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_real_corpus_shape(ray_session):
    got = _run("/root/testdata/sf0.001")
    assert (got["n_masked"] >= got["n_spans"]).all()
    assert ((got["n_spans"] > 0) == got["target_text"].str.len().gt(0)).all()
    # a doc with spans always carries <extra_id_0> in both sides
    has = got[got["n_spans"] > 0]
    assert has["input_text"].str.contains("<extra_id_0>", regex=False).all()
    assert has["target_text"].str.startswith("<extra_id_0>").all()
