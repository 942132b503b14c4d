"""HTML main-content extraction: generic block-classifier rules on
handcrafted pages, synthesis variants, and edge cases. The full
DuckDB parity gate runs via tests/test_queries_vs_duckdb.py (the op is
a registry row)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pdf_ocr_api_ray.pipelines.htmlx import (
    BANNERS,
    classify_blocks,
    extract_main_content,
    synth_html,
)


def test_classifier_rules_on_handcrafted_page():
    html = pd.Series(
        [
            "<nav><a href='/'>Home</a> <a href='/x'>More</a></nav>"
            "<p>seven plain words of real content here</p>"
            "<div>short one</div>"
            "<p>body text with a small <a href='/n'>note</a> link inside it</p>"
            "<footer><a href='/t'>Terms of use</a> <a href='/p'>Privacy policy</a>"
            " all rights reserved</footer>"
        ]
    )
    b = classify_blocks(html)
    assert list(b["tag"]) == ["nav", "p", "div", "p", "footer"]
    # nav: pure links -> density kill even though structure parsed fine
    assert not b.loc[0, "keep"]
    # 7-word plain paragraph survives
    assert b.loc[1, "keep"] and b.loc[1, "visible"].startswith("seven plain")
    # 2-word div dies on word count alone (no anchors)
    assert not b.loc[2, "keep"] and b.loc[2, "anchor_chars"] == 0
    # paragraph with a minor inline link survives (low density)
    assert b.loc[3, "keep"] and b.loc[3, "anchor_chars"] == len("note")
    # link-heavy footer dies on density, not word count
    assert b.loc[4, "words"] >= 6 and not b.loc[4, "keep"]


def test_classifier_strips_tags_and_collapses_whitespace():
    html = pd.Series(["<p>alpha   <b>beta</b>\n gamma delta epsilon zeta</p>"])
    b = classify_blocks(html)
    assert b.loc[0, "visible"] == "alpha beta gamma delta epsilon zeta"
    assert b.loc[0, "keep"]


def test_classifier_empty_input():
    b = classify_blocks(pd.Series(["no blocks at all", ""]))
    assert len(b) == 0


def test_synthesis_variants_exercise_each_rule():
    texts = pd.Series(["tok " * 24, "tok " * 24, "tok " * 24])
    b = classify_blocks(synth_html(np.array([0, 1, 2]), texts))
    banners = b[b["tag"] == "div"].reset_index(drop=True)
    assert len(banners) == 3
    # variant 0: dies on word count (cookie line, no anchors)
    assert banners.loc[0, "words"] < 6 and banners.loc[0, "anchor_chars"] == 0
    # variant 1: enough words, dies on link density alone
    assert banners.loc[1, "words"] >= 6 and not banners.loc[1, "keep"]
    assert 3 * banners.loc[1, "anchor_chars"] > len(banners.loc[1, "visible"])
    # variant 2: boilerplate-by-construction but KEPT by the rules
    assert banners.loc[2, "keep"]
    assert banners.loc[2, "visible"] == BANNERS[2]
    # nav / aside / footer never survive
    assert not b[b["tag"].isin(["nav", "aside", "footer"])]["keep"].any()


def test_extract_main_content_edges(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # doc 2 empty text (variant-2 banner kept anyway), doc 3 NULL text,
    # doc 0 one short tail segment dropped by word count
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 2, 3], pa.int64()),
            "text": pa.array(["alpha beta gamma", "", None], pa.string()),
            "lang": pa.array(["en", "en", "en"], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = (
        extract_main_content(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    # 3-token seg + 'see note' = 5 words -> dropped; nothing kept
    assert out.loc[0, "main_text"] == "" and out.loc[0, "n_kept"] == 0
    assert out.loc[0, "n_blocks"] == 5  # nav banner aside p footer
    # empty text, variant 2: only the notice survives
    assert out.loc[2, "main_text"] == BANNERS[2]
    assert out.loc[2, "n_blocks"] == 4 and out.loc[2, "n_kept"] == 1
    # NULL text behaves like empty (variant 0 banner -> nothing kept)
    assert out.loc[3, "main_text"] == "" and out.loc[3, "n_blocks"] == 4


def test_extract_main_content_block_layout_invariance(ray_session, tmp_path):
    """Output is a pure per-row function — identical under any file
    split (the no-shuffle claim)."""
    import pyarrow.parquet as pq

    src = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    half = src.num_rows // 2
    dirs = {"all": src, "lo": src.slice(0, half), "hi": src.slice(half)}
    outs = {}
    for name, tbl in dirs.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(tbl, str(d / "documents.parquet"))
        outs[name] = extract_main_content(str(d)).to_pandas()
    two = (
        pd.concat([outs["lo"], outs["hi"]])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    one = outs["all"].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, two)


# ---------------------------------------------------------------------------
# Property: classifier == independent per-block reference on random pages
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORD = st.text(alphabet="abcdefgh", min_size=1, max_size=6)
_BLOCK = st.tuples(
    st.sampled_from(["p", "div", "nav", "aside", "footer", "li", "section"]),
    st.lists(_WORD, min_size=0, max_size=12),  # plain words
    st.lists(st.tuples(_WORD, _WORD), min_size=0, max_size=3),  # (anchor text, href) pairs
)


def _reference_verdict(words, anchors):
    """Straight-line per-block reference: visible text is words then
    anchor texts space-joined; keep iff >= 6 words and 3*anchor_chars
    <= visible chars."""
    vis_parts = list(words) + [a for a, _ in anchors]
    visible = " ".join(vis_parts)
    n_words = len(vis_parts)
    anchor_chars = sum(len(a) for a, _ in anchors)
    return visible, n_words >= 6 and 3 * anchor_chars <= len(visible)


@settings(max_examples=60, deadline=None)
@given(st.lists(_BLOCK, min_size=0, max_size=8))
def test_classifier_matches_reference_on_random_pages(blocks):
    html = ""
    for tag, words, anchors in blocks:
        inner = " ".join(
            list(words) + [f'<a href="/{h}">{a}</a>' for a, h in anchors]
        )
        html += f"<{tag}>{inner}</{tag}>"
    out = classify_blocks(pd.Series([html]))
    assert len(out) == len(blocks)
    for i, (tag, words, anchors) in enumerate(blocks):
        visible, keep = _reference_verdict(words, anchors)
        assert out.loc[i, "tag"] == tag
        assert out.loc[i, "visible"] == visible
        assert bool(out.loc[i, "keep"]) == keep, (words, anchors)
