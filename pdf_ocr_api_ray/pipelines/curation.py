"""Corpus-curation operators for training-data preparation —
benchmark decontamination, Gopher-style repetition statistics, and
BM25 relevance ranking over the ``documents`` table.

These extend the training-data operator set (SURVEY.md §2 "beyond the
reference" block) with the three curation steps every large-scale LLM
data pipeline runs between dedup and packing:

- ``decontaminate``: flag documents sharing any n-gram with an eval
  benchmark. The benchmark side is an EXTERNAL, fixed-size suite in
  production (MMLU/GSM8K-style), so broadcasting its n-gram set is the
  canonical small-side broadcast — bounded by the benchmark, never the
  corpus. Here the suite is synthesized deterministically
  (``doc_id % benchmark_mod == 0``) so tests and the DuckDB oracle can
  regenerate it from the same parquet.
- ``repetition_stats``: per-document duplicate-token / duplicate-n-gram
  / top-n-gram fractions (the Gopher repetition-filter signals,
  Rae et al. 2021, Table A1). Pure per-batch map — no shuffle.
- ``bm25_rank``: corpus-wide BM25 top-k for a fixed query. Two bounded
  passes (corpus stats + per-term df, both ≤ |terms|+1 rows on the
  driver) and a distributed partial top-k — the driver never sees more
  than k rows per block. The idf uses the LOG-FREE monotone form
  ``(N - df + ½)/(df + ½)`` — libm ``log`` is the kernel whose last
  ulp differs most across engines, and a monotone transform of idf
  preserves the ranking. Measured parity vs the DuckDB twin: scores
  agree to <1e-9 absolute (one residual ulp from engine-internal
  expression evaluation), rankings identical.

All kernels are vectorized (pandas ``.str`` / numpy segment ops); the
tokenizer is the engine-wide ``\\S+`` split (see pipelines/text.py).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ._util import read_parquet_clean

_TOKEN_RE = re.compile(r"\S+")


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _flat_grams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a batch's texts into n-gram space.

    Returns ``(tok_counts, gram_row_idx, grams)``: per-row token
    counts, the row index of every n-gram, and the n-gram strings
    (space-joined). A row with fewer than ``n`` tokens contributes no
    grams — mirroring ``unnest(range(len(toks)-(n-1)))`` in the SQL
    twin. Vectorized: one explode + (n-1) shifted object-array joins;
    no per-row Python loop.
    """
    toks = texts.str.findall(_TOKEN_RE)
    counts = toks.str.len().to_numpy(dtype=np.int64)
    if counts.sum() == 0:
        return counts, np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    if n == 1:
        return counts, row_idx, flat
    # gram starting at i is valid iff token i+n-1 is in the same row
    valid = row_idx[: -(n - 1)] == row_idx[n - 1 :]
    parts = pd.Series(flat[: len(flat) - (n - 1)][valid], dtype=object)
    for j in range(1, n):
        parts = parts + " " + pd.Series(flat[j : len(flat) - (n - 1) + j][valid], dtype=object)
    return counts, row_idx[: -(n - 1)][valid], parts.to_numpy()


def decontaminate(sf_dir: str, n: int = 3, benchmark_mod: int = 97):
    """Per-document benchmark-contamination report.

    Documents with ``doc_id % benchmark_mod == 0`` form the synthetic
    eval benchmark; every OTHER document is scored by how many of its
    word n-gram POSITIONS also occur (as a distinct n-gram) anywhere in
    the benchmark. Output: one row per non-benchmark document —
    ``(doc_id, n_grams, n_hits, contaminated)`` with ``contaminated``
    an int flag (``n_hits > 0``).

    Scale shape: the benchmark n-gram set is collected with a
    distributed distinct (``Dataset.unique``) and broadcast ONCE via
    ``ray.put``; per-worker it is resolved into a frozenset a single
    time and membership runs through ``pandas.Series.isin`` (C hash
    probes). The broadcast is bounded by the benchmark suite — an
    external fixed-size artifact in production — never by the corpus.
    """
    import ray

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def bench_grams(df: pd.DataFrame):
        import pyarrow as pa

        sel = df[(df["doc_id"] % benchmark_mod) == 0]
        _, _, grams = _flat_grams(sel["text"].fillna(""), n)
        # typed Arrow column: a 0-row object column defeats Ray's
        # block-size estimator (batches with no benchmark docs are
        # the common case)
        return pa.table({"g": pa.array(pd.unique(grams), type=pa.string())})

    # per-batch dedup happens remotely; the driver only unions the
    # already-distinct per-batch gram sets (bounded by the benchmark
    # suite — the same bound the broadcast needs anyway). No shuffle.
    bench_set: set = set()
    for batch in ds.map_batches(bench_grams, batch_format="pandas").iter_batches(
        batch_format="pyarrow"
    ):
        bench_set.update(batch["g"].to_pylist())
    gram_ref = ray.put(frozenset(bench_set))

    _cache: dict = {}

    def score(df: pd.DataFrame) -> pd.DataFrame:
        bench = _cache.get("g")
        if bench is None:
            bench = _cache["g"] = ray.get(gram_ref)
        keep = df[(df["doc_id"] % benchmark_mod) != 0]
        counts, row_idx, grams = _flat_grams(keep["text"].fillna(""), n)
        hits = pd.Series(grams, dtype=object).isin(bench).to_numpy()
        n_hits = np.bincount(row_idx[hits], minlength=len(keep)).astype(np.int64)
        n_grams = np.maximum(counts - (n - 1), 0)
        return pd.DataFrame(
            {
                "doc_id": keep["doc_id"].to_numpy(),
                "n_grams": n_grams,
                "n_hits": n_hits,
                "contaminated": (n_hits > 0).astype(np.int64),
            }
        )

    return ds.map_batches(score, batch_format="pandas")


def repetition_stats(sf_dir: str, n: int = 2):
    """Gopher-style per-document repetition signals (one row per doc):

    - ``n_tokens``; ``dup_token_frac`` = 1 − distinct/total tokens;
    - ``dup_ngram_frac``  = 1 − distinct/total n-grams;
    - ``top_ngram_frac``  = occurrences of the modal n-gram / total.

    Fractions are 0.0 for docs with no tokens/grams. Every division is
    a single IEEE ``int/int`` divide — bit-identical to the SQL twin.
    Pure per-batch map: no shuffle, no state, embarrassingly parallel
    at any corpus size.
    """

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def per_row_stats(df: pd.DataFrame) -> pd.DataFrame:
        texts = df["text"].fillna("")
        tok_counts, tok_rows, toks = _flat_grams(texts, 1)
        _, gram_rows, grams = _flat_grams(texts, n)
        nrows = len(df)

        def frac_stats(rows: np.ndarray, values: np.ndarray) -> tuple[np.ndarray, ...]:
            total = np.bincount(rows, minlength=nrows).astype(np.int64)
            if len(values):
                vc = pd.DataFrame({"r": rows, "v": values}).groupby(
                    ["r", "v"], sort=False
                )["v"].size()
                per_rv = vc.reset_index(name="c")
                distinct = np.bincount(
                    per_rv["r"].to_numpy(), minlength=nrows
                ).astype(np.int64)
                top = np.zeros(nrows, dtype=np.int64)
                np.maximum.at(top, per_rv["r"].to_numpy(), per_rv["c"].to_numpy())
            else:
                distinct = np.zeros(nrows, dtype=np.int64)
                top = np.zeros(nrows, dtype=np.int64)
            return total, distinct, top

        t_total, t_distinct, _ = frac_stats(tok_rows, toks)
        g_total, g_distinct, g_top = frac_stats(gram_rows, grams)
        safe_t = np.maximum(t_total, 1).astype(np.float64)
        safe_g = np.maximum(g_total, 1).astype(np.float64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": t_total,
                "dup_token_frac": (t_total - t_distinct) / safe_t,
                "dup_ngram_frac": (g_total - g_distinct) / safe_g,
                "top_ngram_frac": g_top / safe_g,
            }
        )

    return ds.map_batches(per_row_stats, batch_format="pandas")


DEFAULT_BM25_QUERY = "table scan merge"


def bm25_rank(
    sf_dir: str,
    query: str = DEFAULT_BM25_QUERY,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Corpus-wide BM25 top-``k`` documents for ``query``.

    Three bounded stages:

    1. corpus stats — one aggregate pass over per-batch partials
       (``n_docs``, ``sum_tokens``): ≤ 1 row per block to the driver;
    2. per-term document frequency — per-batch partial df rows, tiny
       ``groupby`` (≤ |terms| rows ever reach the driver);
    3. scoring + DISTRIBUTED top-k — per-batch BM25 over vectorized
       term counts, per-block partial top-k (≤ k rows leave a block),
       global ``sort.limit(k)`` over the reduced set.

    idf is the log-free monotone form ``(N − df + ½)/(df + ½)`` —
    rational double arithmetic end-to-end (libm ``log`` is the worst
    cross-engine ulp hazard and a monotone idf transform preserves
    BM25's ranking); measured DuckDB parity is <1e-9 absolute with
    identical rankings. Ties order by ``doc_id``.
    """
    import pyarrow as pa

    terms = query.split()
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial_stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        row = {"n_docs": [len(df)], "sum_tokens": [int(lens.sum())]}
        for i, term in enumerate(terms):
            tf = np.fromiter(
                (t.count(term) for t in toks), dtype=np.int64, count=len(df)
            )
            row[f"df_{i}"] = [int((tf > 0).sum())]
        return pd.DataFrame(row)

    stats = (
        ds.map_batches(partial_stats, batch_format="pandas")
        .sum(["n_docs", "sum_tokens"] + [f"df_{i}" for i in range(len(terms))])
    )
    n_docs = stats["sum(n_docs)"]
    avgdl = stats["sum(sum_tokens)"] / n_docs
    idf = np.array(
        [
            (n_docs - stats[f"sum(df_{i})"] + 0.5) / (stats[f"sum(df_{i})"] + 0.5)
            for i in range(len(terms))
        ],
        dtype=np.float64,
    )

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        norm = k1 * (1.0 - b + b * (lens.astype(np.float64) / avgdl))
        total = np.zeros(len(df), dtype=np.float64)
        for i, term in enumerate(terms):
            tf = np.fromiter(
                (t.count(term) for t in toks), dtype=np.int64, count=len(df)
            ).astype(np.float64)
            total += idf[i] * (tf * (k1 + 1.0)) / (tf + norm)
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "score": total})
        # partial top-k: at most k rows leave this block
        return out.sort_values(
            ["score", "doc_id"], ascending=[False, True], kind="mergesort"
        ).head(k)

    reduced = ds.map_batches(score, batch_format="pandas")
    return reduced.sort(["score", "doc_id"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------------------
# Segment-level exact dedup (C4-style line dedup)
# ---------------------------------------------------------------------------

# Deterministic duplicate-planting for the segment-dedup corpus: the
# testdata documents are token streams with no repeated lines (and no
# newlines), so the operator's SQL twin regenerates this augmentation —
# every doc_id % SEG_DUP_MOD == 0 document is prepended with one of
# three shared 10-token boilerplate phrases (picked by doc_id % 3).
# Production corpora carry their own boilerplate; this stands in for it
# exactly the way the ANN corpus plants duplicate embeddings.
SEG_DUP_MOD = 5
SEG_DUP_PHRASES = (
    "shared boiler header block alpha one two three four five",
    "shared boiler header block beta one two three four five",
    "shared boiler header block gamma one two three four five",
)

_SEG_IDX_BITS = 21  # ord = doc_id << 21 | seg_idx must stay lexicographic


def _augment_boilerplate(texts: pd.Series, ids: np.ndarray) -> pd.Series:
    texts = texts.fillna("").reset_index(drop=True)
    mask = (ids % SEG_DUP_MOD) == 0
    if mask.any():
        phrases = pd.Series(np.asarray(SEG_DUP_PHRASES, dtype=object)[ids % 3])
        texts = texts.where(~mask, phrases + " " + texts)
    return texts


def _segments(texts: pd.Series, seg_len: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split each text into consecutive ``seg_len``-token segments (last
    one ragged). Returns ``(n_segs_per_row, seg_row_idx, seg_strings)``.
    Vectorized like ``_flat_grams``: one explode + ``seg_len - 1``
    shifted masked concats — no per-row Python."""
    counts, row_idx, flat = _flat_grams(texts, 1)
    n_segs = -(-counts // seg_len)  # ceil
    if counts.sum() == 0:
        return n_segs, np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
    row_start = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=row_start[1:])
    pos = np.arange(len(flat), dtype=np.int64) - row_start[row_idx]
    starts = np.flatnonzero(pos % seg_len == 0)
    segs = pd.Series(flat[starts], dtype=object)
    for j in range(1, seg_len):
        idx = starts + j
        ok = idx < len(flat)
        ok[ok] = pos[idx[ok]] % seg_len == j  # token j of the same segment
        nxt = pd.Series(np.where(ok, flat[np.minimum(idx, len(flat) - 1)], ""))
        segs = segs.where(~ok, segs + " " + nxt)
    return n_segs, row_idx[starts], segs.to_numpy()


def _seg_hashes(segs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """128-bit md5 identity per segment as two int64 columns (Arrow
    groupby keys). Segment equality == digest equality under the
    standard no-md5-collision assumption the oracle shares (it keys on
    the segment string itself, so a collision would surface as a parity
    failure)."""
    import hashlib

    h1 = np.empty(len(segs), dtype=np.int64)
    h2 = np.empty(len(segs), dtype=np.int64)
    for i, s in enumerate(segs):
        d = hashlib.md5(s.encode("utf-8")).digest()
        h1[i] = int.from_bytes(d[:8], "little", signed=True)
        h2[i] = int.from_bytes(d[8:], "little", signed=True)
    return h1, h2


def dedup_segments(
    sf_dir: str,
    seg_len: int = 10,
    num_buckets: int = 256,
):
    """C4-style segment-level exact dedup: every ``seg_len``-token
    segment occurrence survives only if it is the corpus-wide FIRST
    occurrence of that exact segment (ordered by ``(doc_id, seg_idx)``);
    later occurrences are deleted and each document's text is rebuilt
    from its surviving segments. Output: one row per document —
    ``(doc_id, n_segs, n_kept, text_clean)``.

    Scale shape — TWO exchanges total, document text crossing the wire
    exactly ONCE (the asof/union idiom; an earlier draft used
    pack-blobs + ``Dataset.join`` — four exchanges — and spent 7 of its
    10 s wall in exchange ramp):

    1. corpus scan → ``(h1, h2, ord)`` per segment occurrence (~24 B;
       md5 identity, never the segment text);
    2. winner selection — hash-bucketed groupby + per-bucket vectorized
       ``drop_duplicates`` (the ``distinct_pairs`` idiom; ``ord`` is the
       lexicographic ``(doc_id, seg_idx)`` encoding so min == first);
    3. winner rows UNION document rows (typed Arrow tables — an
       all-null pandas column would collapse to Arrow ``null`` and
       break the union schema), ONE ``doc_id``-bucketed groupby
       co-locates each doc's text with its surviving segment indices,
       and the per-bucket rebuild re-segments and emits the kept
       subsequence.

    The boilerplate augmentation (see SEG_DUP_PHRASES) is applied
    identically by the engine and the DuckDB twin, which keys winners
    on the raw segment string via ``row_number() OVER (PARTITION BY
    seg ORDER BY doc_id, seg_idx)``."""
    import pyarrow as pa

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        texts = _augment_boilerplate(df["text"], ids)
        n_segs, seg_rows, segs = _segments(texts, seg_len)
        if len(segs) and (n_segs.max() >> _SEG_IDX_BITS):
            raise ValueError(f"document exceeds 2^{_SEG_IDX_BITS} segments")
        seg_idx = (
            np.arange(len(segs), dtype=np.int64)
            - np.concatenate(([0], np.cumsum(n_segs)[:-1]))[seg_rows]
        )
        h1, h2 = _seg_hashes(segs)
        return pd.DataFrame(
            {
                "h1": h1,
                "h2": h2,
                "b": (h1 % num_buckets).astype(np.int64),
                "ord": (ids[seg_rows] << _SEG_IDX_BITS) | seg_idx,
            }
        )

    def bucket_winners(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["h1", "h2", "ord"]).drop_duplicates(["h1", "h2"])
        ords = g["ord"].to_numpy(dtype=np.int64)
        ids = ords >> _SEG_IDX_BITS
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "db": pa.array(ids % num_buckets, type=pa.int64()),
                "seg_idx": pa.array(ords & ((1 << _SEG_IDX_BITS) - 1), type=pa.int64()),
                "text": pa.nulls(len(ids), type=pa.string()),
            }
        )

    winners = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("b")
        .map_groups(bucket_winners, batch_format="pandas")
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "db": pa.array(ids % num_buckets, type=pa.int64()),
                "seg_idx": pa.array(np.full(len(ids), -1), type=pa.int64()),
                "text": t["text"],
            }
        )

    unioned = ds.map_batches(doc_rows, batch_format="pyarrow").union(winners)

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        is_doc = group["seg_idx"].to_numpy() < 0
        docs = group[is_doc]
        ids = docs["doc_id"].to_numpy(dtype=np.int64)
        texts = _augment_boilerplate(docs["text"], ids)
        n_segs, seg_rows, segs = _segments(texts, seg_len)
        seg_start = np.concatenate(([0], np.cumsum(n_segs)))
        # surviving indices per doc: sort winner rows once, slice by doc
        win = group[~is_doc].sort_values(["doc_id", "seg_idx"])
        w_ids = win["doc_id"].to_numpy(dtype=np.int64)
        w_idx = win["seg_idx"].to_numpy(dtype=np.int64)
        lo = np.searchsorted(w_ids, ids, side="left")
        hi = np.searchsorted(w_ids, ids, side="right")
        out_kept = hi - lo
        clean = [
            " ".join(segs[seg_start[i] + w_idx[lo[i] : hi[i]]]) if hi[i] > lo[i] else ""
            for i in range(len(ids))
        ]
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_segs": n_segs,
                "n_kept": out_kept,
                "text_clean": clean,
            }
        )

    return unioned.groupby("db").map_groups(rebuild, batch_format="pandas")


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Deterministic PII planting (the testdata corpus contains none): every
# doc_id % 7 == 0 document gets one synthetic email + phone appended,
# and every doc_id % 21 == 0 additionally a second email — regenerated
# identically by the SQL twin, exercising 0-, 1- and 2-hit rows.
PII_MOD = 7
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+\d-\d{3}-\d{4}"


def _plant_pii(texts: pd.Series, ids: np.ndarray) -> pd.Series:
    texts = texts.fillna("").reset_index(drop=True)
    idstr = pd.Series(ids.astype(str))
    suffix = (
        " contact user" + idstr + "@mail.example.com or +1-555-"
        + pd.Series((ids % 10000).astype(str)).str.zfill(4)
    )
    texts = texts.where(ids % PII_MOD != 0, texts + suffix)
    alt = " alt user" + idstr + "b@mail.example.com"
    return texts.where(ids % (PII_MOD * 3) != 0, texts + alt)


def pii_scrub(sf_dir: str):
    """Redact emails and phone numbers from every document. Output: one
    row per doc — ``(doc_id, n_emails, n_phones, text_redacted)`` with
    matches replaced by ``<EMAIL>`` / ``<PHONE>`` literals.

    Pure per-batch map (no shuffle, no state): compiled-regex
    ``Series.str.count`` / ``Series.str.replace`` — embarrassingly
    parallel at any corpus size. The patterns are RE2-safe so the
    DuckDB twin runs the byte-identical regexes."""
    email = re.compile(_EMAIL_RE)
    phone = re.compile(_PHONE_RE)

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        texts = _plant_pii(df["text"], ids)
        n_emails = texts.str.count(email).astype(np.int64)
        red = texts.str.replace(email, "<EMAIL>", regex=True)
        n_phones = red.str.count(phone).astype(np.int64)
        red = red.str.replace(phone, "<PHONE>", regex=True)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_emails": n_emails.to_numpy(),
                "n_phones": n_phones.to_numpy(),
                "text_redacted": red.to_numpy(),
            }
        )

    return ds.map_batches(scrub, batch_format="pandas")


# ---------------------------------------------------------------------------
# Temperature mixture resampling
# ---------------------------------------------------------------------------

_MIX_SALT = "mix"


def mix_sample(sf_dir: str, alpha: float = 0.5):
    """Temperature-resample the corpus toward a flatter language
    mixture (the multilingual-training rebalancing step): language
    ``l`` with count ``c_l`` keeps each doc with probability
    ``(c_min / c_l) ** (1 - alpha)`` — 1.0 for the rarest language,
    shrinking for dominant ones. Output: the kept ``(doc_id, lang)``
    rows.

    Two bounded passes: a tiny ``groupby(lang).count()`` (≤ languages
    rows on the driver) computes the per-language probabilities, then a
    pure per-row md5 hash draw (same construction as
    ``sample_stratified``, distinct salt) filters — NO shuffle, no RNG
    state, resume-stable, reproducible at any parallelism. With the
    default ``alpha = 0.5`` the probability is ``sqrt(c_min / c_l)``;
    both numpy and DuckDB ``sqrt`` are correctly-rounded IEEE, so the
    engine and the SQL twin accept bit-identical row sets."""
    import hashlib

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    counts = {
        r["lang"]: r["count()"]
        for r in ds.groupby("lang").count().take_all()
    }
    c_min = min(counts.values())

    def _p(c: int) -> float:
        ratio = np.float64(c_min) / np.float64(c)
        # sqrt is correctly-rounded IEEE in both numpy and DuckDB;
        # libm pow is not — route the default exponent through sqrt
        if 1.0 - alpha == 0.5:
            return float(np.sqrt(ratio))
        return float(ratio ** (1.0 - alpha))

    probs = {lang: _p(c) for lang, c in counts.items()}

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        thresh = df["lang"].map(probs).to_numpy(dtype=np.float64)
        draws = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{_MIX_SALT}|{int(d)}".encode()).digest()[:8],
                    "little",
                )
                & 0xFFFFFFFF
                for d in df["doc_id"]
            ),
            dtype=np.float64,
            count=len(df),
        )
        return df[draws < thresh * 2**32][["doc_id", "lang"]]

    return ds.map_batches(keep, batch_format="pandas")


# ---------------------------------------------------------------------------
# unigram-LM familiarity scoring


DEFAULT_TOP_V = 512


def token_familiarity(sf_dir: str, top_v: int = DEFAULT_TOP_V):
    """Per-document unigram-LM familiarity against a capped top-``top_v``
    corpus vocabulary — the cheap LM-free stand-in for perplexity
    filtering: documents dominated by rare / out-of-vocabulary tokens
    score low and are quality-filter candidates.

    Output per document: ``(doc_id, n_tokens, n_oov, oov_frac,
    familiarity)`` where ``familiarity`` is the mean corpus frequency of
    the doc's in-vocabulary tokens over ALL its tokens and ``oov_frac``
    the out-of-vocabulary fraction (both NULL for token-less docs).

    Scale shape — the driver never holds the vocabulary:

    1. per-batch partial token counts → vocabulary-sized ``groupby``
       (the ``token_freq`` idiom: the shuffle carries distinct words,
       not token occurrences);
    2. DISTRIBUTED top-V by ``(count DESC, word ASC)`` — per-block
       partial top-V folded through 32-way and single-block reductions
       (the ``top_orders`` pattern): ≤ ``top_v`` rows ever reach the
       driver, broadcast once as parallel sorted numpy arrays
       (zero-copy out of plasma);
    3. one stateless scoring scan: flatten each batch's tokens, ONE
       vectorized ``searchsorted`` lookup, per-row sums via
       ``bincount``. Counts are integers ≤ 2^53 so the float64 sums are
       exact and order-independent; the final divisions of exact
       integers are correctly-rounded IEEE in both engines — the SQL
       twin (top-V via ``row_number`` with the same tie-break) matches
       bit-exactly."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial_counts(df: pd.DataFrame) -> pd.DataFrame:
        counts = df["text"].fillna("").str.findall(_TOKEN_RE).explode().value_counts()
        return pd.DataFrame(
            {"w": counts.index.astype(str), "partial": counts.values.astype(np.int64)}
        )

    agg = (
        ds.map_batches(partial_counts, batch_format="pandas")
        .groupby("w")
        .aggregate(Sum("partial", alias_name="c"))
    )

    def local_topv(t: pa.Table) -> pa.Table:
        if t.num_rows <= top_v:
            return t
        idx = pc.select_k_unstable(
            t, k=top_v, sort_keys=[("c", "descending"), ("w", "ascending")]
        )
        return t.take(idx)

    vocab_pd = (
        agg.map_batches(local_topv, batch_format="pyarrow")
        .repartition(32)
        .map_batches(local_topv, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topv, batch_format="pyarrow")
        .to_pandas()  # ≤ top_v rows regardless of vocabulary size
    )
    if "w" not in vocab_pd.columns:  # empty-Dataset schema loss guard
        vocab_pd = pd.DataFrame(
            {"w": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")}
        )
    words = vocab_pd["w"].to_numpy(dtype=str)
    cnts = vocab_pd["c"].to_numpy(dtype=np.int64)
    order = np.argsort(words)
    vocab_ref = ray.put((words[order], cnts[order].astype(np.float64)))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        vwords, vcnts = ray.get(vocab_ref)
        n_tok, row_idx, flat = _flat_grams(df["text"].fillna(""), 1)
        if len(flat):
            f = flat.astype(str)
            pos = np.searchsorted(vwords, f)
            pos_c = np.clip(pos, 0, max(len(vwords) - 1, 0))
            in_vocab = (
                (vwords[pos_c] == f) & (pos < len(vwords))
                if len(vwords)
                else np.zeros(len(f), dtype=bool)
            )
            tok_cnt = np.where(in_vocab, vcnts[pos_c] if len(vwords) else 0.0, 0.0)
            fam_sum = np.bincount(row_idx, weights=tok_cnt, minlength=len(df))
            n_oov = np.bincount(
                row_idx, weights=(~in_vocab).astype(np.float64), minlength=len(df)
            ).astype(np.int64)
        else:
            fam_sum = np.zeros(len(df))
            n_oov = np.zeros(len(df), dtype=np.int64)
        denom = n_tok.astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            oov_frac = np.where(n_tok > 0, n_oov / denom, np.nan)
            familiarity = np.where(n_tok > 0, fam_sum / denom, np.nan)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_tokens": n_tok,
                "n_oov": n_oov,
                "oov_frac": oov_frac,
                "familiarity": familiarity,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# sliding-window context chunking


def chunk_documents(sf_dir: str, window: int = 64, stride: int = 32):
    """Sliding-window context chunking — the step that turns documents
    into overlapping training windows (``window`` tokens every
    ``stride``). A chunk starts at every token offset
    ``s ∈ {0, stride, 2·stride, …}`` with ``s < n_tokens``; the tail
    chunk may be short. Token-less docs emit nothing.

    Shuffle-free single scan: chunk identity is a pure function of the
    row, so output order/content are independent of block layout.
    Chunk construction slices one flattened token array per batch
    (``_flat_grams`` layout) — the only per-chunk Python work is the
    final string join, which is the output payload itself.

    Output: (doc_id, chunk_idx, n_chunk_tokens, chunk_text)."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        n_tok, row_idx, flat = _flat_grams(df["text"].fillna(""), 1)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        doc_start = np.concatenate(([0], np.cumsum(n_tok)))
        n_chunks = -(-n_tok // stride) * (n_tok > 0)  # ceil, 0 for empty
        chunk_doc = np.repeat(np.arange(len(df)), n_chunks)
        # chunk ordinal within its doc (segmented arange)
        first = np.concatenate(([0], np.cumsum(n_chunks)[:-1]))
        cidx = np.arange(int(n_chunks.sum()), dtype=np.int64) - np.repeat(first, n_chunks)
        starts = doc_start[chunk_doc] + cidx * stride
        ends = np.minimum(starts + window, doc_start[chunk_doc] + n_tok[chunk_doc])
        return pd.DataFrame(
            {
                "doc_id": ids[chunk_doc],
                "chunk_idx": cidx,
                "n_chunk_tokens": (ends - starts).astype(np.int64),
                "chunk_text": [
                    " ".join(flat[s:e]) for s, e in zip(starts, ends)
                ],
            }
        )

    return ds.map_batches(chunks, batch_format="pandas")


def curate_corpus(sf_dir: str, frac: float = 0.2):
    """The full curation recipe as ONE lazy DAG — the composition the
    individual operators exist for: deterministic train-split
    assignment (split_corpus's draw), exact global top-``frac``
    quality pruning within the train split (select_top_quality's
    lattice-fold cutoff), and training-window accounting
    (chunk_documents's 64/32 geometry), reduced to a per-language
    summary. Shows the operators compose without materialization:
    one corpus scan feeds a bounded histogram fold, a second scan
    applies split+cutoff+chunk arithmetic and pre-aggregates per
    batch, and a language-keyed groupby over ≤ L rows/block finalizes.

    Output: (lang, n_docs, n_tokens, n_chunks) over the surviving
    train-split documents."""
    import hashlib

    from ray.data.aggregate import Sum

    from ._util import elementwise_fold
    from .sampling import _SPLIT_SALT
    from .text import _quality_cols

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang", "text"])

    def annotate(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        draws = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{_SPLIT_SALT}|{int(d)}".encode()).digest()[:8],
                    "little",
                )
                & 0xFFFFFFFF
                for d in ids
            ),
            dtype=np.int64,
            count=len(ids),
        )
        lower = df["text"].str.lower()
        _, quality = _quality_cols(lower)
        out = pd.DataFrame(
            {
                "doc_id": ids,
                "lang": df["lang"],
                "q": np.rint(quality.to_numpy() * 10000.0).astype(np.int64),
                "n_tokens": lower.str.count(r"\S+").astype("int64"),
            }
        )
        return out[(draws % 100) < 98]  # train split (98/1/1 weights)

    train = ds.map_batches(annotate, batch_format="pandas")

    def hist(df: pd.DataFrame) -> "np.ndarray":
        return np.bincount(df["q"].to_numpy(), minlength=10001).astype(np.int64)

    counts = elementwise_fold(train, hist, np.add, np.int64, (10001,))
    n = int(counts.sum())
    quota = int(np.ceil(frac * n))
    if n == 0 or quota == 0:
        cutoff_idx = 10001  # nothing survives
    else:
        suffix = np.cumsum(counts[::-1])[::-1]
        cutoff_idx = int(np.flatnonzero(suffix >= quota).max())

    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        kept = df[df["q"].to_numpy() >= cutoff_idx]
        toks = kept["n_tokens"].to_numpy()
        g = pd.DataFrame(
            {
                "lang": kept["lang"],
                "n_docs": 1,
                "n_tokens": toks,
                "n_chunks": np.where(toks > 0, -(-toks // 32), 0),
            }
        )
        return g.groupby("lang", as_index=False).sum()

    return (
        train.map_batches(summarize, batch_format="pandas")
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_chunks", alias_name="n_chunks"),
        )
    )


# ---------------------------------------------------------------------------
# Stupid Backoff bigram fluency


SB_LAMBDA_NUM = 2  # λ = 0.4 — Brants et al. 2007's backoff factor, kept
SB_LAMBDA_DEN = 5  # as an exact rational so every term is integer math
FLUENCY_SCALE = 10**9


def gram_tables(sf_dir: str):
    """The fused unigram+bigram corpus count table, materialized once
    and SHARED by every gram-consuming op (``bigram_fluency``,
    ``collocations``): a ``\\S+`` token can never contain the space
    that joins a bigram key, so both count tables ride ONE corpus scan
    and ONE vocabulary-sized groupby collision-free. Returns the
    materialized (g, c) Dataset — bounded by the gram vocabulary, not
    the corpus — which downstream ops consume as many times as needed
    without rescanning the corpus (each op previously rebuilt this
    identical exchange: sharing it halves the pair's combined wall).

    Exchange shape: the per-block partials are Arrow string tables
    (``pc.value_counts`` — C++ counting, and the sort-shuffle
    partitioner sorts Arrow strings instead of pandas object dtype),
    and a cluster-proportional pre-combine (``repartition`` to
    ``max(8, CPUs // 4)`` blocks) shrinks the groupby's all-to-all
    ramp quadratically (the ramp is O(width²) tiny shuffle objects)
    while the exchange width still grows with the cluster — NOT a
    collapse to one block, so a web-scale vocabulary still spreads
    across the keyed exchange. Measured at sf0.1 / 32 CPUs (warm
    workers, clean node): 14.2 s → 7.8 s for the identical 962-row
    (g, c) result."""
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa
        import pyarrow.compute as pc

        texts = df["text"].fillna("")
        tabs = []
        for n in (1, 2):
            _, _, grams = _flat_grams(texts, n)
            vc = pc.value_counts(pa.array(grams, pa.string()))
            tabs.append(
                pa.table(
                    {
                        "g": vc.field("values"),
                        "partial": pc.cast(vc.field("counts"), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(tabs)

    import ray

    width = max(8, int(ray.cluster_resources().get("CPU", 32)) // 4)
    partials = ds.map_batches(partial, batch_format="pandas").repartition(width)
    return (
        partials.groupby("g")
        .aggregate(Sum("partial", alias_name="c"))
        .materialize()  # bounded by the (uni+bi)gram vocabulary
    )


def bigram_fluency(
    sf_dir: str, top_bigrams: int = 1 << 20, top_words: int = 1 << 20,
    grams=None,
):
    """Per-document corpus fluency under a Stupid Backoff bigram LM
    (Brants et al. 2007) — the distributed n-gram-LM quality signal
    that sits between ``token_familiarity`` (unigram familiarity) and
    real perplexity filtering: word-salad documents whose *words* are
    common but whose *transitions* are not score low.

    Each bigram position ``(w1, w2)`` scores

    - ``c(w1 w2) / c(w1)`` when the bigram is in the capped corpus
      bigram table (a *hit*), else
    - ``λ · c(w2) / N`` (backoff to the unigram MLE, λ = 2/5).

    ``fluency`` is the mean position score; ``n_hits`` counts the
    bigram-route positions. Every term is quantized to an integer at
    ``FLUENCY_SCALE`` via pure int64 floor-division — sums are exact
    and order-independent, and the single final double division makes
    the SQL twin bit-identical (the engine-wide quantized-sum rule).
    Int64 headroom: the backoff numerator ``c(w2) · 2·10⁹`` requires
    the hottest word's corpus count < 4.6·10⁹; beyond that (a ~10¹⁰⁺
    token corpus) drop FLUENCY_SCALE to 10⁶ or widen to the HUGEINT /
    object path — the cap is documented, not silent.

    Scale shape (the driver never holds a vocabulary):

    1. unigram AND bigram counts ride ONE corpus scan and ONE
       vocabulary-sized ``groupby`` — a ``\\S+`` token can never
       contain the space that joins a bigram key, so the two gram
       spaces share the count table collision-free; the result is
       materialized once (bounded by the gram vocabulary, not the
       corpus);
    2. the corpus token total ``N`` folds from the materialized
       blocks, and each capped table (top-``top_words`` /
       top-``top_bigrams`` by ``(count DESC, gram ASC)``) folds
       through the distributed partial-top-k chain — ≤ cap rows ever
       reach the driver (the standard web-scale LM-table move);
    3. both tables broadcast once as sorted numpy arrays (zero-copy
       from plasma); ONE stateless scoring scan does three vectorized
       ``searchsorted`` lookups and per-row ``bincount`` sums.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    # the fused (g, c) table — built here unless the caller passes the
    # shared gram_tables() materialization (bench / multi-op pipelines
    # pay the corpus scan + vocabulary exchange ONCE for the pair)
    if grams is None:
        grams = gram_tables(sf_dir)

    # ONE fold chain delivers all three bounded results — the capped
    # unigram table, the capped bigram table, and the corpus token
    # total N (riding as a g="" sentinel row: "" is neither a \S+
    # token nor a space-joined bigram, so it cannot collide)
    def cap_block(t: pa.Table, first: bool) -> pa.Table:
        is_tot = pc.equal(t["g"], "")
        rest = t.filter(pc.invert(is_tot))
        is_big = pc.match_substring(rest["g"], " ")
        uni_all = rest.filter(pc.invert(is_big))
        sides = []
        for side, k in ((rest.filter(is_big), top_bigrams), (uni_all, top_words)):
            if side.num_rows > k:
                idx = pc.select_k_unstable(
                    side, k=k,
                    sort_keys=[("c", "descending"), ("g", "ascending")],
                )
                side = side.take(idx)
            sides.append(side)
        # first pass sums the block's unigram occurrences — over the
        # UNCAPPED unigram side, so N matches the twin's sum over ALL
        # unigram counts even when the top_words cap bites; later
        # passes only merge already-emitted totals (never re-count)
        tot_src = uni_all["c"] if first else t.filter(is_tot)["c"]
        tot = pc.sum(tot_src).as_py() or 0
        sides.append(
            pa.table({"g": pa.array([""], pa.string()),
                      "c": pa.array([tot], pa.int64())})
        )
        return pa.concat_tables(
            [s.select(["g", "c"]) for s in sides if s.num_rows]
        )

    out = (
        grams.map_batches(lambda t: cap_block(t, True), batch_format="pyarrow")
        .repartition(32)
        .map_batches(lambda t: cap_block(t, False), batch_format="pyarrow")
        .repartition(1)
        .map_batches(lambda t: cap_block(t, False), batch_format="pyarrow")
        .to_pandas()  # ≤ top_words + top_bigrams + 1 rows, always
    )
    if "g" not in out.columns:  # empty-Dataset schema loss guard
        out = pd.DataFrame(
            {"g": pd.Series([], dtype=str), "c": pd.Series([], dtype="int64")}
        )
    is_tot = out["g"] == ""
    n_total = int(out.loc[is_tot, "c"].sum())
    rest = out[~is_tot]
    # ASSERTED int64-headroom guard (previously documentation-only):
    # every quantized term is bounded by the hottest gram's corpus
    # count — c_b·scale on the hit route, c_w2·(λnum·scale) on the
    # backoff route — so max_c·λnum·scale must fit int64. The capped
    # table keeps the global max count (cap order is count DESC), so
    # this driver-side check over ≤cap rows is exact and free. Past
    # the bound (a ~10¹⁰⁺-token corpus) drop FLUENCY_SCALE to 10⁶ or
    # widen to object/HUGEINT terms.
    if len(rest):
        max_c = int(rest["c"].max())
        if max_c * SB_LAMBDA_NUM * FLUENCY_SCALE >= 2**63:
            raise OverflowError(
                f"bigram_fluency int64 headroom exceeded: max gram count "
                f"{max_c} x {SB_LAMBDA_NUM} x FLUENCY_SCALE {FLUENCY_SCALE} "
                f">= 2^63 — reduce FLUENCY_SCALE or widen the term type"
            )
    is_big = rest["g"].str.contains(" ", regex=False)

    def sorted_ref(pdf: pd.DataFrame):
        g = pdf["g"].to_numpy(dtype=str)
        c = pdf["c"].to_numpy(dtype=np.int64)
        o = np.argsort(g)
        return ray.put((g[o], c[o]))

    uni_ref = sorted_ref(rest[~is_big])
    big_ref = sorted_ref(rest[is_big])

    scale = FLUENCY_SCALE
    back_num = SB_LAMBDA_NUM * scale
    back_den = SB_LAMBDA_DEN * max(n_total, 1)

    def lookup(table: np.ndarray, cnts: np.ndarray, keys: np.ndarray):
        keys = keys.astype(str)
        if not len(table):
            z = np.zeros(len(keys), dtype=np.int64)
            return np.zeros(len(keys), dtype=bool), z
        pos = np.searchsorted(table, keys)
        pos_c = np.clip(pos, 0, len(table) - 1)
        found = (pos < len(table)) & (table[pos_c] == keys)
        return found, np.where(found, cnts[pos_c], 0)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        uwords, ucnts = ray.get(uni_ref)
        bgrams, bcnts = ray.get(big_ref)
        toks = df["text"].fillna("").str.findall(_TOKEN_RE)
        n_tok = toks.str.len().to_numpy(dtype=np.int64)
        n_big = np.maximum(n_tok - 1, 0)
        n_rows = len(df)
        if n_big.sum() == 0:
            s_q = np.zeros(n_rows, dtype=np.int64)
            n_hits = np.zeros(n_rows, dtype=np.int64)
        else:
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
            row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), n_tok)
            valid = row_idx[:-1] == row_idx[1:]
            w1 = flat[:-1][valid]
            w2 = flat[1:][valid]
            grams = (
                pd.Series(w1, dtype=object) + " " + pd.Series(w2, dtype=object)
            ).to_numpy()
            g_rows = row_idx[:-1][valid]
            b_found, c_b = lookup(bgrams, bcnts, grams)
            u1_found, c_w1 = lookup(uwords, ucnts, w1)
            _, c_w2 = lookup(uwords, ucnts, w2)
            hit = b_found & u1_found
            term = np.where(
                hit,
                (c_b * scale) // np.maximum(c_w1, 1),
                (c_w2 * back_num) // back_den,
            )
            # terms ≤ FLUENCY_SCALE, docs ≤ 2^23 grams → float64-exact
            s_q = np.bincount(
                g_rows, weights=term.astype(np.float64), minlength=n_rows
            ).astype(np.int64)
            n_hits = np.bincount(
                g_rows, weights=hit.astype(np.float64), minlength=n_rows
            ).astype(np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            fluency = np.where(
                n_big > 0, s_q / (n_big.astype(np.float64) * float(scale)), np.nan
            )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_bigrams": n_big,
                "n_hits": n_hits,
                "fluency": fluency,
            }
        )

    return ds.map_batches(score, batch_format="pandas")


# ---------------------------------------------------------------------------
# PMI collocation extraction


PMI_SCALE = 10**6


def collocations(
    sf_dir: str, k: int = 100, min_count: int = 5, num_buckets: int = 256,
    grams=None, _scale: int | None = None,
):
    """Corpus-wide collocation extraction: the top-``k`` bigrams by
    (quantized, log-free) pointwise mutual information — the classic
    corpus-linguistics tool for multi-word expressions and the phrase
    miner phrase-aware tokenizers train on. PMI's log is monotone, so
    ranking on the exact rational ``c(ab)·N / (c(a)·c(b))`` is ranking
    on PMI; the engine quantizes it to ONE int64 per candidate —
    ``score_q = c(ab)·N·10⁶ // (c(a)·c(b))`` — making the SQL twin
    hash-exact (int64 headroom: ``c(ab)·N·10⁶`` < 2⁶³ holds to ~10¹¹
    corpus tokens; past that drop the 10⁶ refinement — documented).

    Fully distributed and exact — no vocabulary broadcast, no driver
    state beyond the final ``k`` rows:

    1. unigram + bigram counts ride ONE scan and ONE vocabulary-sized
       groupby (the ``bigram_fluency`` fused table: the two gram
       spaces cannot collide), materialized once (vocab-bounded);
    2. the token total ``N`` folds from the same blocks;
    3. candidates (``c(ab) ≥ min_count``) attach ``c(a)`` then
       ``c(b)`` through two word-bucketed union exchanges (the
       ``dedup_segments`` co-location idiom — unigram rows and the
       bigram rows keyed by that word land in the same bucket);
    4. a distributed partial-top-k fold returns the ``k`` best by
       ``(score_q DESC, gram ASC)``.

    Output: ``(rank, gram, c_ab, c_a, c_b, score_q)``.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    # the fused (g, c) table — built here unless the caller passes the
    # shared gram_tables() materialization (see bigram_fluency)
    if grams is None:
        grams = gram_tables(sf_dir)

    def n_fold(t: pa.Table) -> pd.DataFrame:
        uni_c = t.filter(pc.invert(pc.match_substring(t["g"], " ")))["c"]
        return pd.DataFrame({"n": [pc.sum(uni_c).as_py() or 0]})

    n_total = int(grams.map_batches(n_fold, batch_format="pyarrow").sum("n") or 0)
    scale = PMI_SCALE if _scale is None else _scale  # _scale: test hook

    from .dedup import _stable64

    def bucket_of(words: pd.Series) -> np.ndarray:
        codes, uniq = pd.factorize(words)
        hb = np.fromiter(
            (_stable64(w) % num_buckets for w in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        return hb[codes].astype(np.int32)

    def stage1_rows(df: pd.DataFrame) -> pd.DataFrame:
        """Split the fused table: unigram rows keyed by their word,
        candidate bigram rows keyed by w1."""
        is_big = df["g"].str.contains(" ", regex=False)
        uni = df[~is_big]
        big = df[is_big & (df["c"] >= min_count)]
        w12 = big["g"].str.split(" ", n=1, expand=True)
        out = pd.DataFrame(
            {
                "key": pd.concat(
                    [uni["g"], w12[0] if len(big) else pd.Series([], dtype=str)],
                    ignore_index=True,
                ),
                "g": pd.concat(
                    [pd.Series([""] * len(uni)), big["g"].reset_index(drop=True)],
                    ignore_index=True,
                ).astype(str),
                "other": pd.concat(
                    [pd.Series([""] * len(uni)), (w12[1] if len(big) else pd.Series([], dtype=str)).reset_index(drop=True)],
                    ignore_index=True,
                ).astype(str),
                "c": pd.concat(
                    [uni["c"], big["c"].reset_index(drop=True)], ignore_index=True
                ).astype(np.int64),
                "c_attached": np.zeros(len(uni) + len(big), dtype=np.int64),
            }
        )
        out["kb"] = bucket_of(out["key"])
        return out

    def attach(g: pd.DataFrame, last: bool) -> pd.DataFrame:
        """In-bucket: map word → unigram count, attach to bigram rows
        keyed by that word; re-key bigrams by their other word (pass 1)
        or emit scored candidates (pass 2). Unigram rows re-emit
        unchanged so pass 2's buckets still hold the lookup table."""
        is_uni = g["g"] == ""
        lut = dict(
            zip(g.loc[is_uni, "key"].to_numpy(object), g.loc[is_uni, "c"].to_numpy())
        )
        big = g[~is_uni]
        attached = big["key"].map(lut).fillna(0).astype(np.int64)
        if not last:
            out_big = pd.DataFrame(
                {
                    "key": big["other"].to_numpy(object),
                    "g": big["g"].to_numpy(object),
                    "other": big["key"].to_numpy(object),
                    "c": big["c"].to_numpy(np.int64),
                    "c_attached": attached.to_numpy(np.int64),
                }
            )
            out_big["kb"] = bucket_of(out_big["key"])
            out = pd.concat([g[is_uni], out_big], ignore_index=True)
            return out[["key", "g", "other", "c", "c_attached", "kb"]]
        c_ab = big["c"].to_numpy(np.int64)
        c_a = big["c_attached"].to_numpy(np.int64)  # from pass 1 (w1)
        c_b = attached.to_numpy(np.int64)  # this pass (w2)
        denom = np.maximum(c_a * c_b, 1)
        # ASSERTED int64-headroom guard (previously documentation-only):
        # the score numerator c(ab)·N·scale must fit int64 — checked in
        # exact Python ints so the check itself cannot overflow. Past
        # the bound (a ~10¹¹-token corpus) drop the 10⁶ refinement.
        if len(c_ab) and int(c_ab.max()) * n_total * scale >= 2**63:
            raise OverflowError(
                f"collocations int64 headroom exceeded: max c_ab "
                f"{int(c_ab.max())} x N {n_total} x scale {scale} >= 2^63 "
                f"— reduce PMI_SCALE or widen the score type"
            )
        score_q = c_ab * n_total * scale // denom
        return pd.DataFrame(
            {
                "gram": big["g"].to_numpy(object),
                "c_ab": c_ab,
                "c_a": c_a,
                "c_b": c_b,
                "score_q": score_q,
            }
        )

    scored = (
        grams.map_batches(stage1_rows, batch_format="pandas")
        .groupby("kb")
        .map_groups(lambda g: attach(g, last=False), batch_format="pandas")
        .groupby("kb")
        .map_groups(lambda g: attach(g, last=True), batch_format="pandas")
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        idx = pc.select_k_unstable(
            t, k=k, sort_keys=[("score_q", "descending"), ("gram", "ascending")]
        )
        return t.take(idx)

    out = (
        scored.map_batches(local_topk, batch_format="pyarrow")
        .repartition(32)
        .map_batches(local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()  # ≤ k rows, always
    )
    if "gram" not in out.columns:  # empty-Dataset schema loss guard
        out = pd.DataFrame(
            {
                "gram": pd.Series([], dtype=str),
                "c_ab": pd.Series([], dtype="int64"),
                "c_a": pd.Series([], dtype="int64"),
                "c_b": pd.Series([], dtype="int64"),
                "score_q": pd.Series([], dtype="int64"),
            }
        )
    out = out.sort_values(
        ["score_q", "gram"], ascending=[False, True], ignore_index=True
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out
