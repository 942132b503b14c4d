"""Text-analysis pipelines over the ``documents`` table — the
training-data-pipeline operator set (language-ID, quality scoring,
token counting, fingerprinting, word frequency).

Every transform is a vectorized ``map_batches`` (pandas ``.str`` /
compiled-regex kernels); global aggregations pre-combine per batch
before the shuffle (token_freq emits one row per distinct word per
batch, not one per token). Each query's semantics are chosen to be
expressible in ANSI SQL so DuckDB can act as the oracle.
"""

from __future__ import annotations

import hashlib
import re

import pandas as pd
import pyarrow as pa

from ._util import read_parquet_clean, round_half_away

_TOKEN_RE = re.compile(r"\S+")
_WS_RE = re.compile(r"\s+")

# language marker words (the per-language n-gram heuristic, kept to
# dictionary words that appear in the synthetic corpus so scores are
# non-degenerate; priority order breaks ties)
LANG_MARKERS: list[tuple[str, list[str]]] = [
    ("en", ["the", "a", "fast", "slow"]),
    ("es", ["data", "sort", "line"]),
    ("fr", ["table", "join"]),
    ("de", ["group", "window"]),
    ("zh", ["stream", "vector"]),
]
_LANG_RES = [(lang, re.compile(r"\b(?:" + "|".join(ws) + r")\b")) for lang, ws in LANG_MARKERS]

STOPWORDS_RE = re.compile(r"\b(?:the|a|of|to|and)\b")


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _lang_scores(lower: pd.Series) -> tuple[dict[str, pd.Series], pd.Series]:
    """Per-language marker scores + first-in-order argmax — the ONE
    language-ID kernel, shared by the fused ``doc_stats`` driver query
    and the standalone ``lang_id`` op (both must match the same SQL
    oracle; duplicating the tie-break loop invites silent de-sync)."""
    out: dict[str, pd.Series] = {}
    scores = []
    for lang, rex in _LANG_RES:
        s = lower.str.count(rex).astype("int64")
        out[f"score_{lang}"] = s
        scores.append((lang, s))
    best = scores[0][1].copy() * 0 - 1
    pred = pd.Series([""] * len(lower), index=lower.index)
    for lang, s in scores:  # first-in-order wins ties
        mask = s > best
        pred = pred.where(~mask, lang)
        best = best.where(~mask, s)
    return out, pred


def _quality_cols(lower: pd.Series) -> tuple[pd.Series, pd.Series]:
    """(stop_ratio, quality) — the ONE quality-score kernel, shared by
    the fused ``doc_stats`` and the standalone ``quality_score``."""
    toks1 = lower.str.count(_TOKEN_RE).clip(lower=1)
    stops = lower.str.count(STOPWORDS_RE)
    stop_ratio = round_half_away(stops / toks1, 4)
    quality = round_half_away(0.5 * stop_ratio + 0.5 * (toks1 / 100.0).clip(upper=1.0), 4)
    return stop_ratio, quality


def doc_stats(sf_dir: str):
    """Per-doc text-analysis profile — ONE scan and one vectorized
    map_batches computing the full per-document projection: token/char
    counts + average word length, per-language marker scores + argmax
    language ID, stopword-ratio quality score, and BPE-style
    pre-tokenizer counts. (Merged from the formerly separate doc_stats
    / lang_id / quality_score / token_count_bpe queries: the driver
    records at most 50 CORRECTNESS rows, and one fused kernel over one
    read is also the shape you'd ship — 4 scans of a 100 TB corpus for
    4 per-doc projections is 3 too many. The individual functions below
    remain as library surface and are pytest-pinned.)"""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        toks = df["text"].str.count(_TOKEN_RE)
        toks1 = toks.clip(lower=1)
        chars = df["text"].str.len()
        nonws = df["text"].str.replace(_WS_RE, "", regex=True).str.len()
        out = {
            "doc_id": df["doc_id"],
            "n_tokens": toks.astype("int64"),
            "n_chars": chars.astype("int64"),
            "avg_word_len": round_half_away(nonws / toks1, 4),
        }
        scores, pred = _lang_scores(lower)
        out.update(scores)
        out["predicted_lang"] = pred
        out["stop_ratio"], out["quality"] = _quality_cols(lower)
        # BPE-style pre-tokenizer counts
        out["n_bpe_tokens"] = df["text"].str.count(_BPE_RE).astype("int64")
        out["n_word_tokens"] = df["text"].str.count(r"[A-Za-z]+").astype("int64")
        out["n_number_tokens"] = df["text"].str.count(r"[0-9]+").astype("int64")
        return pd.DataFrame(out)

    return ds.map_batches(stats, batch_format="pandas")


def lang_id(sf_dir: str):
    """N-gram-marker language ID: per-language marker counts + argmax
    (fixed priority order on ties)."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": df["doc_id"]}
        scores, pred = _lang_scores(df["text"].str.lower())
        out.update(scores)
        out["predicted_lang"] = pred
        return pd.DataFrame(out)

    return ds.map_batches(classify, batch_format="pandas")


def quality_score(sf_dir: str):
    """Heuristic document-quality scoring (stopword ratio + length term)."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        stop_ratio, quality = _quality_cols(lower)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": lower.str.count(_TOKEN_RE).astype("int64"),
                "stop_ratio": stop_ratio,
                "quality": quality,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def normalize_text(text: str) -> str:
    """Canonical fingerprint normalization: lowercase, collapse
    whitespace, trim (the O14 analogue over free text)."""
    return _WS_RE.sub(" ", (text or "").lower()).strip()


def fingerprint(sf_dir: str):
    """Document fingerprinting, fused: md5 of the normalized text
    (exactly reproducible in SQL: md5(trim(regexp_replace(lower(text),
    …)))) PLUS the winnowing rolling-hash sketch projection
    (n_fingerprints, fp_checksum — see ``fingerprint_winnow``). One
    scan, one kernel; merged for the driver's 50-row CORRECTNESS cap
    and because both fingerprints always ship together in a real
    dedup-prep pass."""
    import numpy as np
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    k, w = WINNOW_K, WINNOW_W

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        norm = df["text"].map(normalize_text)
        n_fp, cks = _winnow_arrays(df["text"], k, w)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fp": norm.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()),
                "n_fingerprints": pd.Series(n_fp, dtype="int64", index=df.index),
                "fp_checksum": pd.Series(cks, dtype="int64", index=df.index),
            }
        )

    return ds.map_batches(fp, batch_format="pandas")


WINNOW_K = 3  # tokens per k-gram
WINNOW_W = 4  # winnowing window (k-grams per window)
_WINNOW_P = 1_000_000_007


def _le64(data: str) -> int:
    """Little-endian 64-bit md5 prefix (same arithmetic the SQL oracle
    rebuilds — dedup._stable64's twin for string k-grams)."""
    return int.from_bytes(hashlib.md5(data.encode("utf-8")).digest()[:8], "little")


def _winnow_arrays(texts: pd.Series, k: int, w: int) -> tuple[list[int], list[int]]:
    """Per-doc winnowing projection (n_fingerprints, fp_checksum) for a
    batch of texts — shared by ``fingerprint`` (fused driver query) and
    ``fingerprint_winnow`` (standalone library op)."""
    import numpy as np

    n_fp, cks = [], []
    for text in texts:
        toks = _TOKEN_RE.findall(text or "")
        if len(toks) < k:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        if not grams:
            n_fp.append(0)
            cks.append(0)
            continue
        h = np.fromiter((_le64(g) for g in grams), dtype=np.uint64, count=len(grams))
        if len(h) >= w:
            mins = np.lib.stride_tricks.sliding_window_view(h, w).min(axis=1)
        else:
            mins = h.min(keepdims=True)
        fps = np.unique(mins)
        n_fp.append(len(fps))
        cks.append(int((fps % np.uint64(_WINNOW_P)).sum() % np.uint64(2**62)))
    return n_fp, cks


def fingerprint_winnow(sf_dir: str, k: int = WINNOW_K, w: int = WINNOW_W):
    """Rolling-hash document fingerprinting (winnowing): hash every
    k-token gram, slide a w-gram window and keep each window's minimum,
    emit the distinct minima per document — the classic local
    fingerprint sketch (robust to insertions: an edit only perturbs
    nearby windows). Projection: per-doc fingerprint count + modular
    checksum, both recomputed exactly by the SQL oracle from the same
    md5 k-gram hashes."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def winnow(df: pd.DataFrame) -> pd.DataFrame:
        n_fp, cks = _winnow_arrays(df["text"], k, w)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_fingerprints": pd.Series(n_fp, dtype="int64"),
                "fp_checksum": pd.Series(cks, dtype="int64"),
            }
        )

    return ds.map_batches(winnow, batch_format="pandas")


_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def token_count_bpe(sf_dir: str):
    """BPE-style pre-tokenizer counts: word / number / punctuation
    runs (the GPT-2 pre-tokenization shape, RE2-safe so the SQL oracle
    applies the identical pattern)."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def count(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_bpe_tokens": df["text"].str.count(_BPE_RE).astype("int64"),
                "n_word_tokens": df["text"].str.count(r"[A-Za-z]+").astype("int64"),
                "n_number_tokens": df["text"].str.count(r"[0-9]+").astype("int64"),
            }
        )

    return ds.map_batches(count, batch_format="pandas")


_OCR_JUNK_RE = re.compile(r"\b[eac]{3,}\b", re.IGNORECASE)
_MULTI_SPACE_RE = re.compile(r"\s{2,}")
_MULTI_NL_RE = re.compile(r"(\n\s*){2,}")
_PUNCT_SPACE_RE = re.compile(r"\s+([.,;:])")


def ocr_postclean(sf_dir: str):
    """The reference's legacy tesseract post-clean chain
    (ocr-tesseract.cjs:31-35), order-preserving: strip [eac]{3,} junk
    words, collapse space runs, collapse blank lines, re-attach
    punctuation. Output the cleaned text's md5 + length (the full text
    would bloat the compare; the hash pins every byte)."""
    import hashlib

    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def clean(df: pd.DataFrame) -> pd.DataFrame:
        s = df["text"].str.replace(_OCR_JUNK_RE, "", regex=True)
        s = s.str.replace(_MULTI_SPACE_RE, " ", regex=True)
        s = s.str.replace(_MULTI_NL_RE, "\n", regex=True)
        s = s.str.replace(_PUNCT_SPACE_RE, r"\1", regex=True)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "clean_len": s.str.len().astype("int64"),
                "clean_md5": s.map(lambda x: hashlib.md5(x.encode("utf-8")).hexdigest()),
            }
        )

    return ds.map_batches(clean, batch_format="pandas")


def document_merge(
    sf_dir: str,
    page_layout: tuple[float, float] | None = None,
    chars_per_sq_inch: int = 4,
):
    """Row-to-document templating (the documentmerge sample family,
    src/documentmerge/*): a fixed template rendered per customer row;
    output the rendered document's hash (byte-exact vs the SQL oracle's
    identical concatenation).

    ``page_layout=(width_in, height_in)`` mirrors the htmltopdf
    ``PageLayout`` params (reference:
    src/htmltopdf/html-to-pdf-from-url.js:77-85, an 8 × 11.5 inch
    page): when set, the rendered document is paginated at
    ``floor(w × h × chars_per_sq_inch)`` characters per page and an
    ``n_pages`` column is emitted. Pure integer ceil-division — no
    float parity surface. The default (None) keeps the long-green
    driver row's schema unchanged; ``merge_paginated`` is the
    registered paginating variant (a small synthetic 2 × 3 inch page,
    because at the reference's 8 × 11.5 in every template render is
    one page — degenerate for a correctness row)."""
    import hashlib

    import ray.data as rd

    ds = read_parquet_clean(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_mktsegment", "c_acctbal"]
    )
    cpp = None
    if page_layout is not None:
        cpp = max(1, int(page_layout[0] * page_layout[1] * chars_per_sq_inch))

    def render(df: pd.DataFrame) -> pd.DataFrame:
        rendered = (
            "Dear " + df["c_name"].astype(str)
            + ", your " + df["c_mktsegment"].astype(str)
            + " account balance is " + df["c_acctbal"].map("{:.2f}".format)
            + "."
        )
        out = pd.DataFrame(
            {
                "c_custkey": df["c_custkey"],
                "doc_len": rendered.str.len().astype("int64"),
                "doc_md5": rendered.map(lambda x: hashlib.md5(x.encode("utf-8")).hexdigest()),
            }
        )
        if cpp is not None:
            out["n_pages"] = (out["doc_len"] + cpp - 1) // cpp
        return out

    return ds.map_batches(render, batch_format="pandas")


def merge_paginated(sf_dir: str):
    """``document_merge`` with the htmltopdf pageLayout analogue active
    (see document_merge docstring). The 1 × 2.75 inch synthetic page
    (11 chars/page) straddles the template's 65-68-char render lengths,
    so ``n_pages`` is non-degenerate (6 vs 7)."""
    return document_merge(sf_dir, page_layout=(1.0, 2.75))


def token_freq(sf_dir: str, min_count: int = 50):
    """Corpus word frequency with per-batch pre-aggregation: each batch
    emits one (word, partial_count) row per DISTINCT word — the shuffle
    moves vocabulary-sized data, not token-sized."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["text"].str.findall(_TOKEN_RE).explode().value_counts()
        return pd.DataFrame({"word": counts.index.astype(str), "partial": counts.values})

    partials = ds.map_batches(partial_counts, batch_format="pandas")
    out = partials.groupby("word").aggregate(Sum("partial", alias_name="n"))
    return out.filter(expr=f"n >= {min_count}")


def heavy_hitters(sf_dir: str, phi: float = 0.001):
    """EXACT corpus heavy hitters — every token with frequency
    > ``phi`` × total tokens — WITHOUT a vocabulary-sized shuffle
    (the scale gap in ``token_freq``: its groupby moves every distinct
    word; a 100-TB web corpus has billions of them).

    Two bounded passes (the classic sketch-then-verify shape, with the
    Misra-Gries averaging guarantee):

    1. candidate generation — each batch keeps only tokens whose
       IN-BATCH count exceeds ``phi`` × batch tokens. Superset
       guarantee by averaging: a token with global count > phi·N must
       exceed phi·n_b in at least one batch (if it were ≤ phi·n_b in
       every batch the sums would contradict). ≤ ⌊1/phi⌋ survivors per
       batch, so the distinct-candidate collect is bounded by
       blocks/phi — never the vocabulary;
    2. verification — candidates broadcast once (sorted numpy array,
       zero-copy out of plasma); each batch reduces to ONE
       ``|candidates|+1``-long exact-count vector (last slot = batch
       token total) merged by the shared in-cluster ``elementwise_fold``
       ADD — no keyed exchange at all — and the final filter keeps true
       counts > phi × exact total.

    Output: (word, n). ``phi × total`` is one float64 multiply in both
    engines → identical comparison results → bit-exact SQL parity."""
    import numpy as np
    import ray

    from ._util import elementwise_fold

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])

    def local_candidates(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["text"].fillna("").str.findall(_TOKEN_RE).explode().value_counts()
        n_b = int(counts.values.sum())
        keep = counts[counts.values > phi * n_b]
        return pd.DataFrame({"w": keep.index.astype(str)})

    cand_pd = (
        ds.map_batches(local_candidates, batch_format="pandas")
        .groupby("w")
        .count()
        .to_pandas()  # ≤ blocks/phi rows, already distinct
    )
    if "w" not in cand_pd.columns:  # empty-Dataset schema loss guard
        cand_pd = pd.DataFrame({"w": pd.Series([], dtype=str)})
    cand = np.sort(cand_pd["w"].to_numpy(dtype=str))
    cand_ref = ray.put(cand)
    nc = len(cand)

    def verify_vector(df: pd.DataFrame):
        cands = ray.get(cand_ref)
        vec = np.zeros(nc + 1, dtype=np.int64)
        counts = df["text"].fillna("").str.findall(_TOKEN_RE).explode().value_counts()
        vec[nc] = int(counts.values.sum())  # batch token total, last slot
        words = counts.index.to_numpy(dtype=str)
        if nc and len(words):
            pos = np.clip(np.searchsorted(cands, words), 0, nc - 1)
            hit = cands[pos] == words
            np.add.at(vec, pos[hit], counts.values[hit].astype(np.int64))
        return vec

    vec = elementwise_fold(ds, verify_vector, np.add, np.int64, (nc + 1,))
    import ray.data as rd

    total = int(vec[nc])
    keep = vec[:nc] > phi * total
    final = pd.DataFrame(
        {"word": cand[keep].astype(str), "n": vec[:nc][keep]}
    ).sort_values("word", ignore_index=True)
    if not len(final):
        final = pd.DataFrame(
            {"word": pd.Series([], dtype=str), "n": pd.Series([], dtype="int64")}
        )
    return rd.from_pandas(final)


_HLL_P = 12  # 4096 registers → ~1.6% typical relative error


def distinct_count_hll(sf_dir: str, p: int = _HLL_P) -> dict:
    """Approximate DISTINCT-token count via HyperLogLog — the
    cardinality question ("how many distinct tokens / urls / ids does
    this corpus hold?") answered WITHOUT a distinct shuffle: an exact
    `count(DISTINCT w)` moves the whole vocabulary; here every block
    reduces to ONE 2^p-register blob, registers merge by elementwise
    MAX (associative + idempotent — any partition/retry layout gives
    the SAME registers) through the shared in-cluster
    ``elementwise_fold``, and the estimate is computed from the single
    merged array. The companion exact op is ``token_freq``; this is the
    100-TB first-pass.

    Standard HLL: 64-bit md5 token hash (``dedup._stable64`` — stable
    across processes), register index = top ``p`` bits, rank = leading
    zeros of the remainder + 1; alpha_m bias correction + linear
    counting for the small range. Deterministic: same corpus → same
    registers → same estimate, any parallelism.

    Returns {"estimate": float, "registers_used": int, "p": int}
    (a tiny scalar summary, deliberately not a Dataset —
    tests/test_events_sketch.py-style error-bound gate)."""
    import numpy as np

    from ._util import elementwise_fold
    from .dedup import _tok_hashes

    m = 1 << p

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])

    def batch_registers(df: pd.DataFrame):
        M = np.zeros(m, dtype=np.int64)
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        flat = [t for row in toks for t in row]
        if not flat:
            return M
        h = np.unique(_tok_hashes(flat))
        reg = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # sentinel low bits
        # leading-zero count of the (64-p)-bit remainder + 1 (masked
        # scan: a hash stops counting at its FIRST set bit)
        rank = np.zeros(len(h), dtype=np.int64)
        alive = np.ones(len(h), dtype=bool)
        cur = rest.copy()
        for _ in range(64 - p):
            top_zero = (cur >> np.uint64(63)) == 0
            rank += (alive & top_zero).astype(np.int64)
            alive &= top_zero
            if not alive.any():
                break
            cur = cur << np.uint64(1)
        np.maximum.at(M, reg, rank + 1)
        return M

    M = elementwise_fold(ds, batch_registers, np.maximum, np.int64, (m,)).astype(
        np.float64
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-M))
    zeros = int((M == 0).sum())
    if est <= 2.5 * m and zeros:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    return {"estimate": float(est), "registers_used": m - zeros, "p": p}


_CMS_DEPTH = 4
_CMS_WIDTH = 2048  # per-row cells; eps ≈ e/width ≈ 0.13% of total mass


def freq_sketch_cms(sf_dir: str, depth: int = _CMS_DEPTH, width: int = _CMS_WIDTH) -> dict:
    """Count-Min frequency sketch over corpus tokens — point-frequency
    estimates ("how often does token X occur?") from a fixed
    ``depth × width`` int64 matrix, WITHOUT the vocabulary shuffle an
    exact count table needs. Completes the mergeable-sketch family:
    t-digest (quantiles), HLL (cardinality), CMS (frequency).

    Each batch accumulates its token occurrences into a local matrix
    (row ``d`` indexes by an 11-bit slice of the stable 64-bit md5 token
    hash); matrices merge by elementwise ADD through the shared
    ``elementwise_fold`` (one blob row per block, driver receives one
    matrix). Associative + commutative → identical sketch on any block
    layout / retry schedule. Estimates never undercount
    (``est ≥ true``) and overshoot by at most ``e/width × N`` with
    probability ``1 − e^-depth`` — the classic CMS bound, pinned in
    tests.

    Returns {"matrix": ndarray(depth, width), "n_tokens": int,
    "depth": d, "width": w}; query with ``cms_estimate``."""
    import numpy as np

    from ._util import elementwise_fold
    from .dedup import _tok_hashes

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])

    def batch_matrix(df: pd.DataFrame):
        import numpy as np

        m = np.zeros((depth + 1, width), dtype=np.int64)
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        flat = [t for row in toks for t in row]
        if flat:
            h = _tok_hashes(flat)
            for d in range(depth):
                idx = ((h >> np.uint64(11 * d)) % np.uint64(width)).astype(np.int64)
                np.add.at(m[d], idx, 1)
            m[depth, 0] = len(flat)  # total mass rides the last row
        return m

    m = elementwise_fold(ds, batch_matrix, np.add, np.int64, (depth + 1, width))
    return {
        "matrix": m[:depth],
        "n_tokens": int(m[depth, 0]),
        "depth": depth,
        "width": width,
    }


def cms_estimate(sketch: dict, tokens: list[str]):
    """Point-frequency estimates (min over depth rows) for each token."""
    import numpy as np

    from .dedup import _tok_hashes

    if not tokens:
        return np.zeros(0, dtype=np.int64)
    h = _tok_hashes(list(tokens))
    m, depth, width = sketch["matrix"], sketch["depth"], sketch["width"]
    ests = np.full((depth, len(tokens)), np.iinfo(np.int64).max)
    for d in range(depth):
        idx = ((h >> np.uint64(11 * d)) % np.uint64(width)).astype(np.int64)
        ests[d] = m[d, idx]
    return ests.min(axis=0)


# ---------------------------------------------------------------------------
# Exact global quality-percentile pruning
# ---------------------------------------------------------------------------


def select_top_quality(sf_dir: str, frac: float = 0.2):
    """Keep the top ``frac`` of the corpus by quality score, EXACTLY —
    the data-pruning primitive behind quality-threshold curation
    (train on the best X% of a crawl). "Exactly" means the cutoff is
    the true global order statistic, not a per-partition approximation
    that drifts with block layout.

    The quality score is rounded to 4 decimals, so scores live on a
    10,001-point lattice — the full score distribution is ONE bounded
    80 KB histogram, ADD-merged in-cluster via ``elementwise_fold``
    (driver receives a single row). The cutoff is read off the suffix
    counts, and the final pass is a stateless integer-lattice filter:
    no sort, no shuffle, two passes over a materialized 16 B/row
    (doc_id, quality) projection. Ties at the cutoff are all kept
    (output >= ceil(frac*N) rows; the SQL twin's ``rank() <= quota``
    states the same rule), so output is independent of block layout.

    Output: (doc_id, quality) of the surviving documents."""
    import numpy as np

    from ._util import elementwise_fold

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        _, quality = _quality_cols(df["text"].str.lower())
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"), "quality": quality}
        )

    scored = ds.map_batches(score, batch_format="pandas").materialize()

    def hist(df: pd.DataFrame) -> "np.ndarray":
        idx = np.rint(df["quality"].to_numpy() * 10000.0).astype(np.int64)
        return np.bincount(idx, minlength=10001).astype(np.int64)

    counts = elementwise_fold(scored, hist, np.add, np.int64, (10001,))
    n = int(counts.sum())
    quota = int(np.ceil(frac * n))
    if n == 0 or quota == 0:
        return scored.map_batches(lambda df: df.iloc[:0], batch_format="pandas")
    suffix = np.cumsum(counts[::-1])[::-1]  # suffix[v] = count(q >= v/10000)
    cutoff_idx = int(np.flatnonzero(suffix >= quota).max())

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        idx = np.rint(df["quality"].to_numpy() * 10000.0).astype(np.int64)
        return df[idx >= cutoff_idx]

    return scored.map_batches(keep, batch_format="pandas")


def select_token_budget(sf_dir: str, budget_tokens: int = 25_000):
    """Fill a token budget with the best documents: keep docs in
    (quality DESC, doc_id ASC) order while the running token total
    stays ≤ ``budget_tokens`` — the budgeted variant of
    ``select_top_quality`` (DataComp-style "train on the best B
    tokens"). EXACT: the kept set equals the SQL window rule
    ``sum(n_tokens) OVER (ORDER BY quality DESC, doc_id) <= B``.

    No global sort. The quality lattice collapses the corpus into
    10,001 classes; one fold yields per-class doc counts AND token
    sums (a (2, 10001) int64 array — one row to the driver), which
    locates the boundary class. Inside that class the exact doc_id
    cut point is found by RECURSIVE bounded refinement: histogram the
    class's token mass into 256 equal-width doc_id sub-ranges (one
    fold each level), descend into the range holding the boundary,
    and only when a range holds ≤ 4096 docs collect it — ≤ log₂₅₆(N)
    extra scans of a 20 B/row projection and never more than 4096
    rows on the driver, whatever the quality distribution (a
    uniform-quality corpus puts ALL docs in one class; the refinement
    handles it, a class collect would not)."""
    import numpy as np

    from ._util import elementwise_fold

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        lower = df["text"].str.lower()
        _, quality = _quality_cols(lower)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "q": np.rint(quality.to_numpy() * 10000.0).astype(np.int64),
                "n_tokens": lower.str.count(_TOKEN_RE).astype("int64"),
            }
        )

    scored = ds.map_batches(score, batch_format="pandas").materialize()

    def class_fold(df: pd.DataFrame) -> "np.ndarray":
        out = np.zeros((2, 10001), dtype=np.int64)
        q = df["q"].to_numpy()
        np.add.at(out[0], q, 1)
        np.add.at(out[1], q, df["n_tokens"].to_numpy())
        return out

    cls = elementwise_fold(scored, class_fold, np.add, np.int64, (2, 10001))
    counts, tokens = cls[0], cls[1]

    def emit(filter_fn):
        return scored.map_batches(
            lambda df: filter_fn(df)[["doc_id", "q", "n_tokens"]].rename(
                columns={"q": "quality_idx"}
            ),
            batch_format="pandas",
        )

    total = int(tokens.sum())
    if total <= budget_tokens:  # whole corpus fits
        return emit(lambda df: df)

    # walk classes high→low to the boundary class c
    suffix_above = 0  # tokens in classes strictly above c
    c = 10000
    for c in range(10000, -1, -1):
        if suffix_above + tokens[c] > budget_tokens:
            break
        suffix_above += int(tokens[c])
    remaining = budget_tokens - suffix_above  # token room inside class c

    # recursive refinement for the doc_id cut inside class c
    lo, hi = 0, int(2**63 - 1)
    consumed = 0  # class-c tokens from doc_ids < lo
    while True:
        n_in = int(counts[c]) if (lo, hi) == (0, int(2**63 - 1)) else None
        if n_in is None or n_in > 4096:
            # count + token mass per 256 equal-width sub-ranges
            width = max(1, (hi - lo) // 256 + 1)

            def range_fold(df: pd.DataFrame, lo=lo, hi=hi, width=width) -> "np.ndarray":
                out = np.zeros((2, 256), dtype=np.int64)
                m = (df["q"].to_numpy() == c) & (
                    df["doc_id"].to_numpy() >= lo
                ) & (df["doc_id"].to_numpy() < hi)
                if m.any():
                    ids = df["doc_id"].to_numpy()[m]
                    b = np.minimum((ids - lo) // width, 255)
                    np.add.at(out[0], b, 1)
                    np.add.at(out[1], b, df["n_tokens"].to_numpy()[m])
                return out

            sub = elementwise_fold(scored, range_fold, np.add, np.int64, (2, 256))
            csum = np.cumsum(sub[1])
            b = int(np.searchsorted(csum, remaining - consumed, side="right"))
            if b >= 256:  # everything in range fits
                cut_id = hi
                break
            consumed += int(csum[b - 1]) if b > 0 else 0
            lo, hi = lo + b * width, min(hi, lo + (b + 1) * width)
            if int(sub[0][b]) <= 4096:
                n_in = int(sub[0][b])
            else:
                continue
        # bounded collect of the boundary range
        rows = (
            scored.map_batches(
                lambda df, lo=lo, hi=hi: df[
                    (df["q"] == c) & (df["doc_id"] >= lo) & (df["doc_id"] < hi)
                ],
                batch_format="pandas",
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        cum = consumed + rows["n_tokens"].cumsum()
        fit = rows["doc_id"].to_numpy()[(cum <= remaining - 0).to_numpy()]
        cut_id = int(fit.max()) + 1 if len(fit) else lo
        break

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        q = df["q"].to_numpy()
        return df[(q > c) | ((q == c) & (df["doc_id"].to_numpy() < cut_id))]

    return emit(keep)


def quality_percentile_by_lang(sf_dir: str):
    """Per-row EXACT percentile rank of each document's quality within
    its language — the cross-language calibration transform (a 0.45
    quality means different things in different languages; training
    filters threshold the percentile, not the raw score).

    ``pct_rank`` follows SQL ``percent_rank()``: (rank − 1) / (n − 1)
    with rank = 1 + count(strictly lower in the same language); single
    IEEE division of two ints → bit-exact across engines (0.0 for a
    single-doc language).

    Distributed shape: a bounded language-count groupby discovers the
    (small) language set, ONE (L, 10001) lattice fold carries the full
    per-language score distribution to the driver as one row, and the
    transform itself is a stateless broadcast-lookup scan — no sort,
    no per-row exchange, any block layout gives identical output."""
    import numpy as np

    from ._util import elementwise_fold

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    langs = sorted(
        r["lang"]
        for r in ds.groupby("lang").count().take_all()
    )
    lang_pos = {l: i for i, l in enumerate(langs)}
    L = len(langs)

    def fold(df: pd.DataFrame) -> "np.ndarray":
        out = np.zeros((L, 10001), dtype=np.int64)
        _, quality = _quality_cols(df["text"].str.lower())
        q = np.rint(quality.to_numpy() * 10000.0).astype(np.int64)
        li = df["lang"].map(lang_pos).to_numpy(dtype=np.int64)
        np.add.at(out, (li, q), 1)
        return out

    counts = elementwise_fold(ds, fold, np.add, np.int64, (L, 10001))
    below = np.zeros_like(counts)
    below[:, 1:] = np.cumsum(counts, axis=1)[:, :-1]  # strictly-lower counts
    n_lang = counts.sum(axis=1)

    def transform(df: pd.DataFrame) -> pd.DataFrame:
        _, quality = _quality_cols(df["text"].str.lower())
        q = np.rint(quality.to_numpy() * 10000.0).astype(np.int64)
        li = df["lang"].map(lang_pos).to_numpy(dtype=np.int64)
        n = n_lang[li]
        pct = np.where(n > 1, below[li, q] / np.maximum(n - 1, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "quality": quality,
                "pct_rank": pct,
            }
        )

    return ds.map_batches(transform, batch_format="pandas")


TFIDF_SCALE = 1000  # the score_q refinement factor (shared with the twin)


def tfidf_terms(sf_dir: str, k: int = 5, num_buckets: int = 256, _scale: int | None = None):
    """Per-document characteristic-term extraction: the top-``k`` terms
    of each document by tf-idf — keyword profiling for search indexing
    and topic-drift monitoring. The idf is the engine's LOG-FREE
    monotone form (the ``bm25_rank`` precedent): idf-weighting uses the
    exact rational ``(N − df + ½)/(df + ½)`` quantized to one int64 per
    term, ``score_q = tf · (2(N − df) + 1) · 1000 // (2·df + 1)`` —
    every column is an integer, so the SQL twin is hash-exact (the
    score IS the quantized value by definition; libm never runs).
    Int64 headroom: ``tf · (2N+1) · 1000`` needs tf·N < 9·10¹⁴ — past
    that (a 10¹²-doc corpus) drop the ·1000 refinement or widen to the
    HUGEINT path; documented, not silent.

    Fully distributed — the df map never touches the driver (the
    ``ngram_jaccard`` df-broadcast's documented extreme-vocabulary
    residual is avoided outright, at the price of a second exchange):

    1. one scan emits exact per-doc term frequencies (factorize +
       one ``np.unique`` over packed (row, code) keys — no Python
       loops) bucketed by term-md5;
    2. groupby(term-bucket): df is the term's row count (each doc
       contributes each term once), scores attach in-bucket, and each
       doc's rows CUT to its per-bucket top-``k`` (a guaranteed
       superset of the global top-``k``);
    3. groupby(doc-bucket): the ≤ k·num_buckets surviving rows per doc
       co-locate once; exact (score_q DESC, term ASC) head-``k`` with
       dense ranks.

    N counts ALL documents (token-less docs produce no term rows but
    still shape the idf, like the SQL twin's ``count(*)``)."""
    import numpy as np

    from .dedup import _stable64

    scale = TFIDF_SCALE if _scale is None else _scale  # _scale: test hook
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    n_docs = ds.count()

    def tf_rows(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        counts = toks.str.len().to_numpy(dtype=np.int64)
        if counts.sum() == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "term": pd.Series([], dtype=str),
                    "tf": pd.Series([], dtype="int64"),
                    "tb": pd.Series([], dtype="int32"),
                }
            )
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if len(t)])
        row_idx = np.repeat(np.arange(len(df), dtype=np.int64), counts)
        codes, uniq = pd.factorize(pd.Series(flat, dtype=object))
        packed = row_idx * len(uniq) + codes
        u, tf = np.unique(packed, return_counts=True)
        r, c = u // len(uniq), u % len(uniq)
        terms = uniq.to_numpy(dtype=object) if hasattr(uniq, "to_numpy") else np.asarray(uniq, dtype=object)
        hb = np.fromiter(
            (_stable64(t) % num_buckets for t in terms),
            dtype=np.int64,
            count=len(terms),
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64)[r],
                "term": terms[c],
                "tf": tf.astype(np.int64),
                "tb": hb[c].astype(np.int32),
            }
        )

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # a doc appears in exactly one input batch, so (doc, term) rows
        # are globally unique: df(term) == the term's row count here
        dfreq = g.groupby("term")["term"].transform("size").to_numpy(np.int64)
        tf = g["tf"].to_numpy(np.int64)
        # ASSERTED int64-headroom guard (previously documentation-only):
        # the score numerator tf·(2N+1)·scale must fit int64 — checked
        # in exact Python ints so the check itself cannot overflow.
        # Past the bound (a 10¹²-doc corpus) drop the ·1000 refinement
        # or widen to the HUGEINT path.
        if len(tf) and int(tf.max()) * (2 * n_docs + 1) * scale >= 2**63:
            raise OverflowError(
                f"tfidf_terms int64 headroom exceeded: max tf {int(tf.max())} "
                f"x (2N+1={2 * n_docs + 1}) x scale {scale} >= 2^63 — "
                f"reduce the score refinement or widen the score type"
            )
        score_q = tf * (2 * (n_docs - dfreq) + 1) * scale // (2 * dfreq + 1)
        out = pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "term": g["term"].to_numpy(object),
                "tf": tf,
                "df": dfreq,
                "score_q": score_q,
            }
        )
        # per-bucket per-doc top-k: superset of the global top-k
        out = out.sort_values(
            ["doc_id", "score_q", "term"], ascending=[True, False, True]
        )
        out = out.groupby("doc_id", sort=False).head(k)
        out["db"] = (out["doc_id"].to_numpy(np.int64) % num_buckets).astype(np.int32)
        return out

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["doc_id", "score_q", "term"], ascending=[True, False, True]
        )
        g = g.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
        g["rank"] = g.groupby("doc_id", sort=False).cumcount() + 1
        return g[["doc_id", "rank", "term", "tf", "df", "score_q"]]

    return (
        ds.map_batches(tf_rows, batch_format="pandas")
        .groupby("tb")
        .map_groups(attach_df, batch_format="pandas")
        .groupby("db")
        .map_groups(finalize, batch_format="pandas")
    )


NTILE_ID_BITS = 44  # composite-rank doc_id field width (guarded)


def quality_deciles(sf_dir: str, k: int = 10):
    """Exact equal-depth quality binning — ntile(k) over the global
    (quality DESC, doc_id ASC) order, the feature-binning /
    curriculum-phase assignment that must NOT drift with block layout.
    Output ``(doc_id, quality_idx, decile)`` with ``decile`` ∈ 1..k
    exactly equal to the SQL window's ``ntile(k)``.

    No global sort: the two order fields pack into ONE sortable int64
    composite key ``(10000 - q) << 44 | doc_id`` (quality lattice in
    the high bits — DESC via complement; doc_id < 2^44 asserted), and
    ``sampling.rank_by_key`` assigns the exact ascending rank with two
    metadata folds + one range-bucket exchange. The ntile fill rule
    (first ``n % k`` buckets take ``n//k + 1`` rows) is then a
    stateless integer map over the rank — bit-equal to DuckDB."""
    import numpy as np

    from .sampling import rank_by_key

    if k <= 0:
        raise ValueError("k must be positive")

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def score(df: pd.DataFrame) -> pd.DataFrame:
        _, quality = _quality_cols(df["text"].str.lower())
        q = np.rint(quality.to_numpy() * 10000.0).astype(np.int64)
        ids = df["doc_id"].astype("int64").to_numpy()
        if len(ids) and (ids.min() < 0 or ids.max() >= 1 << NTILE_ID_BITS):
            raise OverflowError("doc_id outside the composite-key field")
        return pd.DataFrame(
            {
                "doc_id": ids,
                "quality_idx": q,
                "key": ((10000 - q) << NTILE_ID_BITS) | ids,
            }
        )

    # pin the ranked blocks: count() and the ntile scan would otherwise
    # each re-run the rank exchange (the k-means read-pinning idiom)
    ranked = rank_by_key(ds.map_batches(score, batch_format="pandas"), "key").materialize()
    n = ranked.count()
    if n == 0:
        return ranked.map_batches(
            lambda df: df.iloc[:0][["doc_id", "quality_idx"]], batch_format="pandas"
        )
    size_lo, rem = divmod(n, k)
    size_hi = size_lo + 1
    cut = rem * size_hi

    def ntile(df: pd.DataFrame) -> pd.DataFrame:
        r = df["row_no"].to_numpy(np.int64)
        dec = np.where(
            r < cut, r // size_hi, rem + (r - cut) // max(size_lo, 1)
        ) + 1
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "quality_idx": df["quality_idx"].astype("int64"),
                "decile": dec.astype(np.int64),
            }
        )

    return ranked.map_batches(ntile, batch_format="pandas")
