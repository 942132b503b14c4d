"""Curation operators (pipelines/curation.py): hand-computed edge
semantics on a synthetic documents table. Corpus-level DuckDB parity
at sf0.001 is covered by test_queries_vs_duckdb (the three ops live in
rotated_out_queries with full oracle_sql twins).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(tmp_path, rows: list[tuple[int, str]]) -> str:
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array(["en"] * len(rows)),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1] or "") for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")
    return str(tmp_path)


def test_decontaminate_planted_overlap(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import decontaminate

    # doc 0 is the benchmark (mod=97 → 0 qualifies); doc 1 repeats a
    # benchmark trigram twice (both POSITIONS count); doc 2 shares
    # bigrams but no trigram; doc 3 is too short for any trigram.
    sf = _write_docs(
        tmp_path,
        [
            (0, "alpha beta gamma delta"),
            (1, "x alpha beta gamma y alpha beta gamma"),
            (2, "alpha beta zzz beta gamma qqq"),
            (3, "alpha beta"),
        ],
    )
    got = (
        decontaminate(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got["n_grams"].tolist() == [6, 4, 0]
    assert got["n_hits"].tolist() == [2, 0, 0]
    assert got["contaminated"].tolist() == [1, 0, 0]


def test_repetition_stats_known_fractions(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import repetition_stats

    sf = _write_docs(
        tmp_path,
        [
            (1, "a a a a"),          # 4 toks, 1 distinct; bigrams: "a a" x3
            (2, "w x y z"),          # all distinct
            (3, ""),                 # empty
            (4, "solo"),             # 1 token, no bigram
        ],
    )
    got = (
        repetition_stats(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_tokens"].tolist() == [4, 4, 0, 1]
    np.testing.assert_allclose(got["dup_token_frac"], [0.75, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(got["dup_ngram_frac"], [2 / 3, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(got["top_ngram_frac"], [1.0, 1 / 3, 0.0, 0.0])


def test_bm25_rank_orders_by_relevance(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import bm25_rank

    # 'merge' is rarer than 'table' → doc holding it outranks a
    # same-length doc with the common term; tf monotonicity within a
    # term; docs without any query term score 0 and rank by doc_id.
    filler = " ".join(f"f{i}" for i in range(8))
    sf = _write_docs(
        tmp_path,
        [
            (1, f"table {filler}"),
            (2, f"merge {filler}"),
            (3, f"table table {filler[:-3]}"),
            (4, f"nothing here {filler}"),
            (5, f"table scan merge {filler}"),
            (6, f"also nothing {filler}"),
        ],
    )
    got = bm25_rank(sf, k=6).to_pandas()
    assert got["doc_id"].tolist()[0] == 5          # all three terms
    ranks = {d: i for i, d in enumerate(got["doc_id"].tolist())}
    assert ranks[2] < ranks[1]                     # rare term beats common
    assert ranks[3] < ranks[1]                     # higher tf beats tf=1
    assert got["doc_id"].tolist()[-2:] == [4, 6]   # zero-score tail by id
    assert (got["score"].to_numpy()[:-2] > 0).all()
    np.testing.assert_allclose(got["score"].to_numpy()[-2:], 0.0)


def test_dedup_segments_global_first_wins(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import dedup_segments

    seg = "s0 s1 s2 s3 s4 s5 s6 s7 s8 s9"          # one full segment
    tail = "t0 t1 t2 t3"
    # ids avoid %5==0 so no boilerplate augmentation interferes
    sf = _write_docs(
        tmp_path,
        [
            (1, f"{seg} {tail}"),                   # first owner of seg
            (2, f"{seg} other words here now"),     # loses seg, keeps tail
            (3, f"{seg} {seg}"),                    # within-doc dup: 2nd loses
            (4, "tiny doc"),                        # short single segment
            (6, "tiny doc"),                        # exact dup of 4 → empty
            (7, ""),                                # empty doc
        ],
    )
    got = (
        dedup_segments(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["doc_id"].tolist() == [1, 2, 3, 4, 6, 7]
    assert got["n_segs"].tolist() == [2, 2, 2, 1, 1, 0]
    assert got["n_kept"].tolist() == [2, 1, 0, 1, 0, 0]
    assert got["text_clean"].tolist() == [
        f"{seg} {tail}",
        "other words here now",
        "",                                         # both segments == seg, doc 1 owns it
        "tiny doc",
        "",
        "",
    ]


def test_dedup_segments_boilerplate_augmentation(ray_session, tmp_path):
    """doc_id % 5 == 0 docs share a planted 10-token phrase (same
    doc_id % 3 residue → same phrase): the smallest doc_id keeps it,
    later ones lose exactly that first segment."""
    from pdf_ocr_api_ray.pipelines.curation import SEG_DUP_PHRASES, dedup_segments

    body_a = "a0 a1 a2 a3 a4 a5 a6 a7 a8 a9"
    body_b = "b0 b1 b2 b3 b4 b5 b6 b7 b8 b9"
    # 10 % 3 == 1 and 25 % 3 == 1 → both get SEG_DUP_PHRASES[1]
    sf = _write_docs(tmp_path, [(10, body_a), (25, body_b)])
    got = (
        dedup_segments(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_segs"].tolist() == [2, 2]
    assert got["n_kept"].tolist() == [2, 1]
    assert got["text_clean"].tolist() == [
        f"{SEG_DUP_PHRASES[1]} {body_a}",
        body_b,
    ]


def test_pii_scrub_planting_and_inline(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import pii_scrub

    sf = _write_docs(
        tmp_path,
        [
            (1, "reach me at alice@corp.example.org today"),  # inline email
            (2, "no pii in here"),
            (7, "planted"),                                   # +1 email +1 phone
            (21, "doubly planted"),                           # +2 emails +1 phone
        ],
    )
    got = (
        pii_scrub(sf)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert got["n_emails"].tolist() == [1, 0, 1, 2]
    assert got["n_phones"].tolist() == [0, 0, 1, 1]
    assert got["text_redacted"].tolist() == [
        "reach me at <EMAIL> today",
        "no pii in here",
        "planted contact <EMAIL> or <PHONE>",
        "doubly planted contact <EMAIL> or <PHONE> alt <EMAIL>",
    ]


def test_mix_sample_rarest_lang_fully_kept(ray_session, tmp_path):
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.curation import mix_sample

    n_en = 64
    rows = [(i, f"text {i}", "en") for i in range(n_en)] + [(100, "rare", "xx")]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows]),
            "lang": pa.array([r[2] for r in rows]),
            "source": pa.array(["s0"] * len(rows)),
            "n_chars": pa.array([len(r[1]) for r in rows], type=pa.int64()),
        }
    )
    pq.write_table(t, f"{tmp_path}/documents.parquet")

    got = mix_sample(str(tmp_path)).to_pandas().sort_values("doc_id", ignore_index=True)
    assert 100 in got["doc_id"].tolist()            # p(rarest) == 1.0

    # replicate the draw: p(en) = sqrt(1/64) = 0.125 exactly
    def u32(d):
        h = hashlib.md5(f"mix|{d}".encode()).digest()[:8]
        return int.from_bytes(h, "little") & 0xFFFFFFFF

    expect = sorted(
        [i for i in range(n_en) if u32(i) < 0.125 * 2**32] + [100]
    )
    assert got["doc_id"].tolist() == expect


def test_merge_paginated_page_counts(ray_session):
    from pdf_ocr_api_ray.pipelines.text import document_merge, merge_paginated

    base = document_merge("/root/testdata/sf0.001").to_pandas()
    assert "n_pages" not in base.columns            # default schema unchanged
    got = merge_paginated("/root/testdata/sf0.001").to_pandas()
    assert (got["n_pages"] == (got["doc_len"] + 10) // 11).all()
    assert got["n_pages"].nunique() >= 2            # non-degenerate


def test_bm25_partial_topk_bounds_block_output(ray_session, tmp_path):
    """The per-block partial keeps ≤ k rows: global result over many
    blocks still has exactly k rows and the true best doc survives."""
    from pdf_ocr_api_ray.pipelines.curation import bm25_rank

    rows = [(i, "padding text only") for i in range(200)]
    rows[137] = (137, "table scan merge table scan merge")
    sf = _write_docs(tmp_path, rows)
    got = bm25_rank(sf, k=5).to_pandas()
    assert len(got) == 5
    assert got["doc_id"].iloc[0] == 137


def test_token_familiarity_cap_and_empty_doc(ray_session, tmp_path):
    """A top_v far below the vocabulary keeps cap semantics exact (SQL
    twin with the same LIMIT + tie-break), tokens outside the cap count
    as OOV, and a token-less doc scores NULL."""
    import duckdb

    from pdf_ocr_api_ray.pipelines.curation import token_familiarity

    # 'a' x4, 'b' x3, then c..j once each (ties broken by word ASC)
    rows = [
        (0, "a a b c d"),
        (1, "a b e f g"),
        (2, "a b h i j"),
        (3, ""),
        (4, "a z z z z"),
    ]
    sf = _write_docs(tmp_path, rows)
    got = (
        token_familiarity(sf, top_v=3)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    exp = con.execute(
        r"""
        WITH toks AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS w
            FROM documents
        ), cnt AS (
            SELECT w, count(*) AS c FROM toks GROUP BY w
        ), vocab AS (
            SELECT w, c FROM cnt ORDER BY c DESC, w LIMIT 3
        ), agg AS (
            SELECT t.doc_id, count(*) AS n_tokens,
                   sum(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS n_oov,
                   sum(coalesce(v.c, 0)) AS fam_sum
            FROM toks t LEFT JOIN vocab v ON t.w = v.w
            GROUP BY t.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(a.n_oov, 0) AS BIGINT) AS n_oov,
               CASE WHEN a.n_tokens > 0
                    THEN CAST(a.n_oov AS DOUBLE) / a.n_tokens END AS oov_frac,
               CASE WHEN a.n_tokens > 0
                    THEN CAST(a.fam_sum AS DOUBLE) / a.n_tokens END AS familiarity
        FROM documents d LEFT JOIN agg a USING (doc_id)
        ORDER BY doc_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)

    # cap semantics by hand: counts a:5, z:4, b:3, c..j:1 → vocab
    # (count DESC, word ASC, LIMIT 3) = {a:5, z:4, b:3}; doc 4
    # (a + 4×z) is fully in-vocab: fam = (5 + 4×4) / 5
    d4 = got[got["doc_id"] == 4].iloc[0]
    assert d4["n_oov"] == 0 and d4["familiarity"] == (5 + 4 * 4) / 5
    # doc 0: c, d are OOV under the cap
    assert got[got["doc_id"] == 0].iloc[0]["n_oov"] == 2
    # token-less doc: NULL scores
    d3 = got[got["doc_id"] == 3].iloc[0]
    assert d3["n_tokens"] == 0 and np.isnan(d3["oov_frac"])


def test_heavy_hitters_verify_pass_filters_local_only(ray_session, tmp_path):
    """A token that is heavy INSIDE one block but light globally must
    be produced as a candidate and then rejected by the exact verify
    pass; output equals the brute-force SQL on any block layout."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import heavy_hitters

    def write(path, rows):
        t = pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": pa.array([r[1] for r in rows], type=pa.string()),
                "lang": pa.array(["en"] * len(rows)),
                "source": pa.array(["s0"] * len(rows)),
                "n_chars": pa.array(
                    [len(r[1] or "") for r in rows], type=pa.int64()
                ),
            }
        )
        pq.write_table(t, path)

    d = tmp_path / "documents.parquet"
    d.mkdir()
    # block 1: 'spike' is 10/20 tokens (locally heavy at phi=0.3)
    write(d / "a.parquet", [(0, " ".join(["spike"] * 10 + ["pad"] * 10))])
    # block 2: 200 'bulk' tokens dilute spike to 10/220 < 0.3 globally
    write(d / "b.parquet", [(1, " ".join(["bulk"] * 200))])

    got = heavy_hitters(str(tmp_path), phi=0.3).to_pandas()

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/*.parquet')"
    )
    exp = con.execute(
        r"""
        WITH toks AS (
            SELECT unnest(regexp_extract_all(coalesce(text,''), '\S+')) AS w
            FROM documents
        ), tot AS (SELECT count(*) AS n FROM toks)
        SELECT w AS word, CAST(count(*) AS BIGINT) AS n
        FROM toks, tot GROUP BY w, tot.n
        HAVING count(*) > 0.3 * tot.n
        ORDER BY word
        """
    ).df()
    pd.testing.assert_frame_equal(got, exp)
    # the global heavy hitter survives, the local-only spike does not
    assert got["word"].tolist() == ["bulk"]


def test_chunk_documents_overlap_and_tail(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.curation import chunk_documents

    sf = _write_docs(
        tmp_path,
        [
            (1, "t0 t1 t2 t3 t4 t5 t6"),  # 7 toks → starts 0,2,4,6
            (2, "a b"),                    # one window-covered chunk
            (3, ""),                       # no chunks
        ],
    )
    got = (
        chunk_documents(sf, window=4, stride=2)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"], ignore_index=True)
    )
    assert got["doc_id"].tolist() == [1, 1, 1, 1, 2]
    assert got["chunk_idx"].tolist() == [0, 1, 2, 3, 0]
    assert got["n_chunk_tokens"].tolist() == [4, 4, 3, 1, 2]
    assert got["chunk_text"].tolist() == [
        "t0 t1 t2 t3",
        "t2 t3 t4 t5",
        "t4 t5 t6",
        "t6",
        "a b",
    ]


# ---------------------------------------------------------------------------
# select_top_quality: exact global percentile pruning
# ---------------------------------------------------------------------------


def test_select_top_quality_exact_and_layout_invariant(ray_session, tmp_path):
    """Engine cutoff == brute-force sort on the same scores; output is
    identical whether the corpus arrives as one file or split."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import quality_score, select_top_quality

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    outs = {}
    for name, tbls in {"all": [src], "split": [src.slice(0, 250), src.slice(250)]}.items():
        d = tmp_path / name
        d.mkdir()
        import pyarrow as pa
        pq.write_table(pa.concat_tables(tbls), str(d / "documents.parquet"))
        # split layout: force multiple blocks via a second dir trick is
        # unnecessary — block layout varies with read parallelism anyway
        outs[name] = (
            select_top_quality(str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
    pd.testing.assert_frame_equal(outs["all"], outs["split"])

    # brute-force reference: sort all scores, keep >= the quota-th
    scores = quality_score("/root/testdata/sf0.001").to_pandas()
    q = np.ceil(0.2 * len(scores)).astype(int)
    cutoff = np.sort(scores["quality"].to_numpy())[::-1][q - 1]
    expect = scores.loc[scores["quality"] >= cutoff, ["doc_id", "quality"]]
    got = outs["all"]
    assert set(got["doc_id"]) == set(expect["doc_id"])
    assert len(got) >= q  # ties kept


def test_select_top_quality_tie_class_all_kept(ray_session, tmp_path):
    """Uniform-quality corpus: every doc ties at the cutoff -> ALL kept
    regardless of frac (the stated tie rule), never a partial class."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import select_top_quality

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.int64()),
            "text": pa.array(["alpha beta gamma"] * 10, pa.string()),
            "lang": pa.array(["en"] * 10, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = select_top_quality(str(tmp_path), frac=0.3).to_pandas()
    assert len(out) == 10


def test_select_top_quality_zero_frac_empty(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import select_top_quality

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b", "c d"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = select_top_quality(str(tmp_path), frac=0.0).to_pandas()
    assert len(out) == 0


def test_select_token_budget_refinement_path(ray_session, tmp_path):
    """10,000 uniform-quality docs — ONE lattice class holding far more
    than the 4096-row collect cap, forcing the recursive doc_id-range
    refinement. Expected set = the first K doc_ids whose token prefix
    fits (all docs identical: 10 tokens each, budget 1005 -> exactly
    100 docs kept, ids 0..99)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import select_token_budget

    n = 10_000
    text = "tok " * 10  # 10 tokens, identical quality everywhere
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(n)), pa.int64()),
            "text": pa.array([text.strip()] * n, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        select_token_budget(str(tmp_path), budget_tokens=1005)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == list(range(100))
    assert out["n_tokens"].sum() == 1000


def test_select_token_budget_edges(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import select_token_budget

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c", "d e"], pa.string()),
            "lang": pa.array(["en", "en"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    # budget covers everything -> whole corpus kept
    assert len(select_token_budget(str(tmp_path), budget_tokens=10**9).to_pandas()) == 2
    # zero budget -> nothing
    assert len(select_token_budget(str(tmp_path), budget_tokens=0).to_pandas()) == 0


def test_quality_percentile_by_lang_semantics(ray_session, tmp_path):
    """percent_rank semantics: strictly-lower count over (n-1); all-tie
    languages and single-doc languages both rank 0.0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.text import quality_percentile_by_lang

    # lang 'aa': three docs with distinct quality (token counts 10/50/200
    # -> increasing length term); lang 'bb': two identical docs; 'cc': one
    rows = [
        (1, "tok " * 10, "aa"),
        (2, "tok " * 50, "aa"),
        (3, "tok " * 200, "aa"),
        (4, "tok " * 30, "bb"),
        (5, "tok " * 30, "bb"),
        (6, "tok " * 7, "cc"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1].strip() for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        quality_percentile_by_lang(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
    )
    assert out.loc[1, "pct_rank"] == 0.0
    assert out.loc[2, "pct_rank"] == 0.5
    assert out.loc[3, "pct_rank"] == 1.0
    assert out.loc[4, "pct_rank"] == 0.0 and out.loc[5, "pct_rank"] == 0.0
    assert out.loc[6, "pct_rank"] == 0.0


def test_collocations_planted_pmi(ray_session, tmp_path):
    """Known count algebra: quantized PMI scores, min_count exclusion,
    and the (score DESC, gram ASC) tie-break."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.curation import collocations

    docs = [
        (1, "new york new york new york"),
        (2, "new york new york new york"),
        (3, "of the of the of the of the of the of"),
    ]
    tmp_path.mkdir(exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    got = collocations(str(tmp_path), k=10, min_count=5)
    # york-new (4) and the-of (5<...): counts — "of the" 5x, "the of" 5x
    n = 23  # 12 + 11 tokens
    by = got.set_index("gram")
    assert by.loc["new york", "c_ab"] == 6
    assert by.loc["new york", "score_q"] == 6 * n * 10**6 // 36
    assert "york new" not in by.index  # c_ab=4 < min_count
    # tie-break: equal-score grams order lexicographically
    assert list(got["rank"]) == sorted(got["rank"])
    assert (
        got.sort_values(["score_q", "gram"], ascending=[False, True])["gram"].tolist()
        == got["gram"].tolist()
    )


def test_shared_gram_table_matches_standalone(ray_session):
    """bigram_fluency and collocations consuming ONE shared
    gram_tables() materialization must equal their standalone runs
    bit-for-bit — the shared-scan contract bench.py relies on."""
    import pandas as pd

    from pdf_ocr_api_ray.pipelines.curation import (
        bigram_fluency,
        collocations,
        gram_tables,
    )

    sf = "/root/testdata/sf0.001"
    shared = gram_tables(sf)
    bf_a = bigram_fluency(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    bf_b = (
        bigram_fluency(sf, grams=shared)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(bf_a, bf_b)
    co_a = collocations(sf).reset_index(drop=True)
    co_b = collocations(sf, grams=shared).reset_index(drop=True)
    pd.testing.assert_frame_equal(co_a, co_b)


def test_bigram_fluency_overflow_guard_raises(ray_session, monkeypatch):
    """The int64-headroom cap is an asserted guard, not a docstring: a
    FLUENCY_SCALE so large any gram count trips the bound must raise a
    clear OverflowError instead of silently wrapping (the guard runs
    driver-side on the bounded capped table, so monkeypatching the
    module constant reaches it)."""
    import pytest

    from pdf_ocr_api_ray.pipelines import curation

    monkeypatch.setattr(curation, "FLUENCY_SCALE", 2**62)
    with pytest.raises(OverflowError, match="bigram_fluency int64 headroom"):
        curation.bigram_fluency("/root/testdata/sf0.001")


def test_collocations_overflow_guard_raises(ray_session):
    """Same contract for the PMI quantizer — the guard runs inside the
    distributed stage, so the scale override rides the closure."""
    import pytest
    import ray.exceptions

    from pdf_ocr_api_ray.pipelines.curation import collocations

    with pytest.raises(Exception, match="collocations int64 headroom"):
        collocations("/root/testdata/sf0.001", _scale=2**62)
