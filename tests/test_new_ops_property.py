"""Property tests for the continued-r4 gram-table ops: random tiny
corpora vs straight-line Counter references of the same spec. These
hunt bucket-boundary / batching bugs the planted tests can't reach —
the SQL twins already pin the real tables via the rotated_out gate."""

import hashlib
from collections import Counter

import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings

_WORD = st.sampled_from(["a", "b", "c", "ab", "xyz"])
_DOC = st.lists(_WORD, min_size=0, max_size=10).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=6)


def _write(path, texts, sources=None):
    path.mkdir(parents=True, exist_ok=True)
    n = len(texts)
    cols = {
        "doc_id": pa.array(range(1, n + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }
    if sources is not None:
        cols["source"] = pa.array(sources, pa.string())
    pq.write_table(pa.table(cols), path / "documents.parquet")


@settings(max_examples=12, deadline=None)
@given(_CORPUS)
def test_tfidf_terms_matches_counter_reference(ray_session, tmp_path_factory, texts):
    from pdf_ocr_api_ray.pipelines.text import tfidf_terms

    tmp = tmp_path_factory.mktemp("tfidf")
    _write(tmp, texts)
    k = 3
    got = tfidf_terms(str(tmp), k=k).to_pandas()
    if not any(t.split() for t in texts):
        # token-less corpus: empty result (Ray's empty-Dataset schema
        # loss means no columns either — the documented quirk)
        assert len(got) == 0
        return
    got = got.sort_values(["doc_id", "rank"]).reset_index(drop=True)
    n = len(texts)
    tf = {
        i + 1: Counter(t.split()) for i, t in enumerate(texts)
    }
    df = Counter()
    for c in tf.values():
        df.update(c.keys())
    rows = []
    for did, c in tf.items():
        scored = sorted(
            (
                (-(int(c[w]) * (2 * (n - df[w]) + 1) * 1000 // (2 * df[w] + 1)), w)
                for w in c
            )
        )[:k]
        for r, (neg, w) in enumerate(scored, 1):
            rows.append((did, r, w, c[w], df[w], -neg))
    exp = pd.DataFrame(
        rows, columns=["doc_id", "rank", "term", "tf", "df", "score_q"]
    ).sort_values(["doc_id", "rank"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=12, deadline=None)
@given(_CORPUS)
def test_bigram_fluency_matches_counter_reference(
    ray_session, tmp_path_factory, texts
):
    from pdf_ocr_api_ray.pipelines.curation import bigram_fluency

    tmp = tmp_path_factory.mktemp("bf")
    _write(tmp, texts)
    got = (
        bigram_fluency(str(tmp))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    toks = [t.split() for t in texts]
    uni = Counter(w for t in toks for w in t)
    big = Counter(
        (t[i], t[i + 1]) for t in toks for i in range(len(t) - 1)
    )
    n_total = sum(uni.values())
    for i, t in enumerate(toks):
        row = got.iloc[i]
        n_big = max(len(t) - 1, 0)
        assert row["n_bigrams"] == n_big
        s, hits = 0, 0
        for j in range(n_big):
            w1, w2 = t[j], t[j + 1]
            if (w1, w2) in big:
                hits += 1
                s += big[(w1, w2)] * 10**9 // uni[w1]
            else:
                s += uni.get(w2, 0) * 2 * 10**9 // (5 * max(n_total, 1))
        assert row["n_hits"] == hits
        if n_big:
            assert row["fluency"] == s / (n_big * 1e9)
        else:
            assert np.isnan(row["fluency"])


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(_DOC, st.sampled_from(["s1", "s2", "s3"])),
        min_size=1,
        max_size=8,
    )
)
def test_source_overlap_matches_set_reference(ray_session, tmp_path_factory, docs):
    from pdf_ocr_api_ray.pipelines.dedup import source_overlap

    tmp = tmp_path_factory.mktemp("so")
    _write(tmp, [t for t, _ in docs], sources=[s for _, s in docs])
    got = source_overlap(str(tmp), n=2).set_index(["src_a", "src_b"])
    sets: dict[str, set] = {}
    for t, s in docs:
        w = t.split()
        sets.setdefault(s, set()).update(
            f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)
        )
    sets = {s: g for s, g in sets.items() if g}
    keys = sorted(sets)
    expected_pairs = [(a, b) for i, a in enumerate(keys) for b in keys[i + 1 :]]
    assert list(got.index) == expected_pairs
    for a, b in expected_pairs:
        inter = len(sets[a] & sets[b])
        assert got.loc[(a, b), "n_common"] == inter
        assert got.loc[(a, b), "n_a"] == len(sets[a])
        union = len(sets[a] | sets[b])
        assert got.loc[(a, b), "jaccard"] == (inter / union if union else 0)
