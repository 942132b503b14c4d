"""HTML main-content extraction — the north-rule capability the
reference implies but never ships (its intake is PDF-only; the rule
names "HTML boilerplate strip … DOM heuristics" as part of the
main-content extraction family).

The operator is a *generic* boilerpipe-style block classifier (Kohlschütter
et al., WSDM 2010 — shallow text features: link density + block length):

1. parse the page into top-level DOM blocks
   (``nav / aside / footer / div / p / section / article / h1-6 / li``),
2. per block compute visible text (tags stripped, whitespace collapsed),
   its word count, and its anchor-text character mass,
3. keep a block iff ``words >= MIN_WORDS`` and
   ``ANCHOR_DENSITY_NUM * anchor_chars <= visible_chars`` (integer
   compare — exact in every engine), and
4. re-join the surviving blocks in document order.

The rules know nothing about where the HTML came from; the parity gate
feeds them a deterministic synthesized page per testdata document (nav
bar, one of three banner variants, a link-list sidebar, the document's
text as 12-token ``<p>`` blocks — every 4th with an inline anchor — and
a footer). The variants are chosen so each rule fires on its own: the
short cookie banner dies on word count alone, the promo banner dies on
link density alone (9 words but 27 anchor chars), and the archived-page
notice is *kept* even though the synthesis considers it boilerplate —
proof the classifier applies heuristics rather than inverting the
synthesis. The DuckDB twin regenerates the expected output from the
raw ``documents.text`` column with the same integer arithmetic.

Scale design: shuffle-free single scan — block identity, visibility
and the keep decision are pure functions of the row, so output is
independent of block layout; the kernels are pandas/regex vectorized
(one ``extractall`` per batch, no per-row Python). At 100 TB this is
the cheapest operator class in the engine: read → map_batches → write.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ._util import read_parquet_clean
from .curation import _segments

# -- generic classifier constants (boilerpipe-style) -----------------------
MIN_WORDS = 6  # blocks shorter than this are chrome/noise
ANCHOR_DENSITY_NUM = 3  # keep iff 3 * anchor_chars <= visible_chars (<= 1/3)

_BLOCK_RE = re.compile(
    r"<(p|div|nav|aside|footer|section|article|h[1-6]|li)\b[^>]*>(.*?)</\1\s*>",
    re.S,
)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

# -- deterministic page synthesis (the corpus stand-in; SQL-regenerable) ---
SEG_TOKENS = 12  # main-content <p> granularity
LINK_EVERY = 4  # every 4th <p> carries an inline anchor
_NAV = (
    '<nav><a href="/">Home</a> <a href="/docs">Docs</a> '
    '<a href="/contact">Contact</a></nav>'
)
_ASIDE = '<aside><a href="/t1">related one</a> <a href="/t2">related two</a></aside>'
_FOOTER = (
    '<footer>(c) 2024 Example Corp <a href="/terms">Terms</a> '
    '<a href="/privacy">Privacy</a></footer>'
)
# banner variant by doc_id % 3: dropped by word count / dropped by link
# density / KEPT by both rules despite being boilerplate-by-construction
BANNERS = (
    "We use cookies here.",
    'Subscribe now for great offers: <a href="/sub">subscribe today</a> '
    '<a href="/deal">member deals</a>',
    "This archived page is provided for reference purposes only.",
)
_INLINE_A = ' <a href="/ref">see note</a>'


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def synth_html(ids: np.ndarray, texts: pd.Series) -> pd.Series:
    """Deterministic HTML page per (doc_id, text) — vectorized string
    assembly; the only per-row state is ``doc_id % 3`` (banner pick)."""
    texts = texts.fillna("").reset_index(drop=True)
    n_segs, seg_row, segs = _segments(texts, SEG_TOKENS)
    if len(segs):
        first = np.zeros(len(n_segs), dtype=np.int64)
        np.cumsum(n_segs[:-1], out=first[1:])
        in_row = np.arange(len(segs), dtype=np.int64) - first[seg_row]
        body = pd.Series(segs, dtype=object)
        body = "<p>" + body.where(in_row % LINK_EVERY != 0, body + _INLINE_A) + "</p>"
        per_row = body.groupby(seg_row).agg("".join)
        per_row = per_row.reindex(range(len(texts)), fill_value="")
    else:
        per_row = pd.Series([""] * len(texts), dtype=object)
    banners = pd.Series(np.asarray(BANNERS, dtype=object)[ids % 3])
    return (
        _NAV
        + '<div class="banner">'
        + banners
        + "</div>"
        + _ASIDE
        + per_row.to_numpy()
        + _FOOTER
    )


def classify_blocks(html: pd.Series) -> pd.DataFrame:
    """DOM-lite block classification. Returns one row per parsed block:
    (row, order, tag, visible, words, anchor_chars, keep) — ``row`` is
    the positional index into ``html``, ``order`` the block's document
    order. Pure function of the input string; pandas-vectorized."""
    html = html.reset_index(drop=True)
    m = html.str.extractall(_BLOCK_RE)
    if len(m) == 0:
        return pd.DataFrame(
            {
                "row": np.empty(0, dtype=np.int64),
                "order": np.empty(0, dtype=np.int64),
                "tag": np.empty(0, dtype=object),
                "visible": np.empty(0, dtype=object),
                "words": np.empty(0, dtype=np.int64),
                "anchor_chars": np.empty(0, dtype=np.int64),
                "keep": np.empty(0, dtype=bool),
            }
        )
    # pandas extractall returns NaN (not '') for a zero-length group
    # match — an empty block like <p></p> must classify as empty text
    inner = m[1].fillna("")
    visible = (
        inner.str.replace(_TAG_RE, "", regex=True)
        .str.replace(_WS_RE, " ", regex=True)
        .str.strip()
    )
    words = visible.str.count(r"\S+").to_numpy(dtype=np.int64)
    anchor_chars = (
        inner.str.findall(_A_RE).str.join("").str.len().to_numpy(dtype=np.int64)
    )
    vis_chars = visible.str.len().to_numpy(dtype=np.int64)
    keep = (words >= MIN_WORDS) & (ANCHOR_DENSITY_NUM * anchor_chars <= vis_chars)
    idx = m.index.to_frame(index=False)
    return pd.DataFrame(
        {
            "row": idx.iloc[:, 0].to_numpy(dtype=np.int64),
            "order": idx.iloc[:, 1].to_numpy(dtype=np.int64),
            "tag": m[0].to_numpy(dtype=object),
            "visible": visible.to_numpy(dtype=object),
            "words": words,
            "anchor_chars": anchor_chars,
            "keep": keep,
        }
    )


def extract_main_content(sf_dir: str):
    """Main-content extraction over the documents table: synthesize the
    deterministic page per document, classify its blocks with the
    generic rules, and emit the surviving content.

    Output: (doc_id, main_text, n_blocks, n_kept) — ``main_text`` is
    the kept blocks' visible text joined by newlines in document order.
    """
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        blocks = classify_blocks(synth_html(ids, df["text"]))
        kept = blocks[blocks["keep"]]
        main = kept.groupby("row")["visible"].agg("\n".join)
        main = main.reindex(range(len(df)), fill_value="")
        n_blocks = (
            blocks.groupby("row").size().reindex(range(len(df)), fill_value=0)
        )
        n_kept = (
            kept.groupby("row").size().reindex(range(len(df)), fill_value=0)
        )
        return pd.DataFrame(
            {
                "doc_id": ids,
                "main_text": main.to_numpy(dtype=object),
                "n_blocks": n_blocks.to_numpy(dtype=np.int64),
                "n_kept": n_kept.to_numpy(dtype=np.int64),
            }
        )

    return ds.map_batches(fn, batch_format="pandas")
