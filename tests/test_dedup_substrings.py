"""Windowed ExactSubstr (dedup.dedup_substrings) — SQL-twin parity
rides the rotated_out gate in test_queries_vs_duckdb; here the op is
pinned against an independent straight-line python reference on a
planted corpus exercising cross-document duplication, same-document
repetition, first-occurrence survival, short/empty/null docs — plus
block-layout invariance on the real table."""

import re
from collections import Counter

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
W = 8


def _ref(docs: list[tuple[int, str | None]], w: int = W) -> pd.DataFrame:
    """Straight-line spec: tag every non-first occurrence of a window
    string that occurs >= 2 times corpus-wide (first = min (doc_id,
    pos)); mask covered tokens; rebuild from unmasked tokens."""
    occ = []
    for did, text in docs:
        tk = re.findall(r"\S+", text or "")
        for p in range(len(tk) - w + 1):
            occ.append((" ".join(tk[p : p + w]), did, p))
    counts = Counter(k for k, _, _ in occ)
    first = {}
    for key, did, p in sorted(occ, key=lambda t: (t[1], t[2])):
        first.setdefault(key, (did, p))
    rows = []
    for did, text in docs:
        tk = re.findall(r"\S+", text or "")
        masked = [False] * len(tk)
        for p in range(len(tk) - w + 1):
            key = " ".join(tk[p : p + w])
            if counts[key] >= 2 and first[key] != (did, p):
                for i in range(p, p + w):
                    masked[i] = True
        rows.append(
            (
                did,
                len(tk),
                sum(masked),
                " ".join(t for t, m in zip(tk, masked) if not m),
            )
        )
    return (
        pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_masked", "text_clean"])
        .astype({"doc_id": "int64", "n_tokens": "int64", "n_masked": "int64"})
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


def _run(sf_dir: str, **kw) -> pd.DataFrame:
    from pdf_ocr_api_ray.pipelines.dedup import dedup_substrings

    return (
        dedup_substrings(sf_dir, **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


# doc_ids avoid % 5 == 0 so the boilerplate augmentation (identical in
# engine and reference via its absence) stays a no-op here
BASE = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15 t16 t17 t18 t19"
PLANTED = [
    (1, BASE),  # first occurrence of every window it contains
    (2, " ".join(BASE.split()[5:16])),  # tokens 5..15 of doc 1 (11 toks)
    (3, "x1 x2 x3 x4 x5 x6 x7 x8 sep x1 x2 x3 x4 x5 x6 x7 x8"),  # self-rep
    (4, "a b c d e f g"),  # 7 tokens < w: no windows, untouched
    (6, ""),  # empty
    (7, None),  # null
    (8, BASE),  # exact copy of doc 1 — fully masked
]


def test_matches_reference_on_planted_corpus(ray_session, tmp_path):
    _write_corpus(tmp_path, PLANTED)
    got = _run(str(tmp_path))
    pd.testing.assert_frame_equal(got, _ref(PLANTED))


def test_first_occurrence_survives(ray_session, tmp_path):
    _write_corpus(tmp_path, PLANTED)
    got = _run(str(tmp_path)).set_index("doc_id")
    # doc 1 is the global first occurrence of all its windows: untouched
    assert got.loc[1, "n_masked"] == 0
    assert got.loc[1, "text_clean"] == BASE
    # doc 2 is an 11-token exact subsequence of doc 1: fully masked
    assert got.loc[2, "n_masked"] == 11
    assert got.loc[2, "text_clean"] == ""
    # doc 3's second x1..x8 run is masked, the first kept
    assert got.loc[3, "n_masked"] == 8
    assert got.loc[3, "text_clean"] == "x1 x2 x3 x4 x5 x6 x7 x8 sep"
    # short / empty / null docs pass through
    assert got.loc[4, "n_masked"] == 0 and got.loc[4, "text_clean"] == "a b c d e f g"
    assert got.loc[6, "n_tokens"] == 0 and got.loc[6, "text_clean"] == ""
    assert got.loc[7, "n_tokens"] == 0 and got.loc[7, "text_clean"] == ""
    # doc 8 duplicates doc 1 exactly but comes later: fully masked
    assert got.loc[8, "n_masked"] == 20 and got.loc[8, "text_clean"] == ""


def test_layout_invariant(ray_session, tmp_path):
    """Verdicts are a pure function of corpus content — identical
    output whether the real table is one file or three (different Ray
    block layouts → different batch/bucket boundaries)."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    one = tmp_path / "one"
    one.mkdir()
    pq.write_table(t, one / "documents.parquet")
    three = tmp_path / "three"
    (three / "documents.parquet").mkdir(parents=True)
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(
            t.slice(lo, hi - lo), three / "documents.parquet" / f"p{i}.parquet"
        )
    a = _run(str(one))
    b = _run(str(three))
    pd.testing.assert_frame_equal(a, b)
    # the real corpus has natural repetition: the op provably fires
    assert (a["n_masked"] > 0).sum() > 50
