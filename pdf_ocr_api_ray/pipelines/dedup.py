"""Deduplication pipelines — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup (the large-scale training-data
operator set).

Corpus note: the synthetic ``documents`` table has no duplicate texts,
so exact/near-dup queries run over a deterministic *augmented* corpus —
the original docs plus an exact copy (doc_id + 1_000_000) of every
doc_id % 5 == 0 and, for near-dup paths, a mutated copy (one token
replaced) of every doc_id % 7 == 0. The augmentation is plain
column arithmetic, so SQL oracles can reproduce it where the algorithm
itself is SQL-expressible; sketch-based paths (MinHash, SimHash) are
verified rows-only + by their own pytest oracles.

Scale design:
- hashes/sketches are computed vectorized per batch (one pass, stable
  md5-based hashing — reproducible across processes, unlike Python's
  salted ``hash``);
- exact dedup = groupby(content-hash) keep-min — the only shuffle
  carries (hash, doc_id) pairs, not text;
- MinHash-LSH = shingle→minhash→band rows→groupby(band, band_hash)→
  candidate pairs→exact-Jaccard verify; band rows are (2×ints+id),
  constant size per doc regardless of text length;
- embedding near-dup brute force compares against a broadcast matrix
  (fine ≤ ~10^5 vectors; the LSH-bucketed variant is the scale path).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away

_TOKEN_RE = re.compile(r"\S+")

N_HASHES = 64
N_BANDS = 16  # 16 bands × 4 rows
_RNG = np.random.RandomState(0x5EED)
# odd multipliers → bijective affine maps over Z/2^64 (fast wraparound
# hashing; no big-int/object math in the signature loop)
_A = (_RNG.randint(0, 1 << 62, size=N_HASHES).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_B = _RNG.randint(0, 1 << 62, size=N_HASHES).astype(np.uint64)


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _stable64(token: str) -> int:
    """Stable 64-bit token hash (md5 prefix) — identical across
    processes/nodes, unlike builtin ``hash``."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


def _augmented_documents(sf_dir: str, mutated: bool = False):
    """documents ∪ exact copies (id%5==0, +1_000_000) ∪ optionally
    mutated copies (id%7==0, +2_000_000, first token doubled)."""
    import ray.data as rd

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def dup_rows(df: pd.DataFrame) -> pd.DataFrame:
        outs = [df[["doc_id", "text"]]]
        exact = df[df["doc_id"] % 5 == 0].copy()
        exact["doc_id"] = exact["doc_id"] + 1_000_000
        outs.append(exact[["doc_id", "text"]])
        if mutated:
            mut = df[df["doc_id"] % 7 == 0].copy()
            mut["doc_id"] = mut["doc_id"] + 2_000_000
            mut["text"] = mut["text"].str.replace(r"^(\S+)", r"\1 \1", regex=True, n=1)
            outs.append(mut[["doc_id", "text"]])
        return pd.concat(outs, ignore_index=True)

    return ds.map_batches(dup_rows, batch_format="pandas")


def dedup_exact(sf_dir: str):
    """Exact dedup: content-hash groupby keeping the minimum doc_id.
    Output: one row per distinct content with the surviving id and the
    duplicate count."""
    from ray.data.aggregate import Count, Min

    ds = _augmented_documents(sf_dir)

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df["content_hash"] = df["text"].map(
            lambda s: hashlib.md5(s.encode("utf-8")).hexdigest()
        )
        return df[["doc_id", "content_hash"]]

    hashed = ds.map_batches(add_hash, batch_format="pandas")
    return hashed.groupby("content_hash").aggregate(
        Min("doc_id", alias_name="survivor_id"), Count(alias_name="n_copies")
    )


def _shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


def _minhash_sig(tokens: list[str]) -> np.ndarray:
    sh = _shingles(tokens)
    if not sh:
        return np.full(N_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    hv = np.array([_stable64(s) for s in sh], dtype=np.uint64)
    # (a*h + b) mod 2^64 for all permutations × shingles, min per permutation
    sig = (hv[None, :] * _A[:, None] + _B[:, None]).min(axis=1)
    return sig


def dedup_minhash_lsh(sf_dir: str, jaccard_threshold: float = 0.6):
    """MinHash+LSH near-dup detection: signature → band rows →
    groupby(band_id, band_hash) buckets → candidate pairs → exact
    shingle-Jaccard verification. Returns confirmed pairs (a < b)."""
    import ray.data as rd

    ds = _augmented_documents(sf_dir, mutated=True)

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows_per_band = N_HASHES // N_BANDS
        out = {"doc_id": [], "band_id": [], "band_hash": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sig = _minhash_sig(_TOKEN_RE.findall(text or ""))
            for b in range(N_BANDS):
                band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                bh = hashlib.md5(band.tobytes()).hexdigest()[:16]
                out["doc_id"].append(doc_id)
                out["band_id"].append(b)
                out["band_hash"].append(bh)
        return pd.DataFrame(out)

    bands = ds.map_batches(band_rows, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group["doc_id"].unique())
        pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
        if not pairs:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame(pairs, columns=["id_a", "id_b"])

    candidates = (
        bands.groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")  # distinct pairs
    )

    # verification: the candidate set is tiny relative to the corpus
    # (LSH's whole point), so collect the candidate ids, re-read ONLY
    # those documents with a pushed-down row filter, and verify the
    # pairs vectorized. At 10^12 docs this is the same shape: a keyed
    # point-read of |candidates| rows, never a full-corpus broadcast.
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    cand = candidates.to_pandas()
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []}).astype(
            {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
        )

    needed = set(cand["id_a"]) | set(cand["id_b"])
    base_needed = {int(i) % 1_000_000 for i in needed}
    base = _pq.read_table(
        _t(sf_dir, "documents"),
        columns=["doc_id", "text"],
        filters=_pc.field("doc_id").isin(sorted(base_needed)),
    ).to_pandas()
    texts: dict[int, str] = dict(zip(base["doc_id"].astype(int), base["text"]))
    # re-derive the augmented copies' texts (exact: +1e6; mutated: +2e6)
    for i in list(needed):
        i = int(i)
        if i >= 2_000_000:
            src = texts.get(i - 2_000_000)
            if src is not None:
                texts[i] = re.sub(r"^(\S+)", r"\1 \1", src, count=1)
        elif i >= 1_000_000:
            src = texts.get(i - 1_000_000)
            if src is not None:
                texts[i] = src

    keep_a, keep_b, jac = [], [], []
    sh_cache: dict[int, set] = {}

    def sh(i: int) -> set:
        if i not in sh_cache:
            sh_cache[i] = _shingles(_TOKEN_RE.findall(texts.get(i, "")))
        return sh_cache[i]

    for a, b in zip(cand["id_a"], cand["id_b"]):
        sa, sb = sh(int(a)), sh(int(b))
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= jaccard_threshold:
            keep_a.append(int(a))
            keep_b.append(int(b))
            jac.append(round(j, 4))
    return pd.DataFrame(
        {"id_a": pd.Series(keep_a, dtype="int64"), "id_b": pd.Series(keep_b, dtype="int64"), "jaccard": jac}
    )


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token features (stable md5 token hashes)."""
    if not tokens:
        return 0
    hv = np.array([_stable64(t) for t in tokens], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = bits.sum(axis=0) * 2 - len(tokens)
    out = 0
    for i in range(63, -1, -1):
        out = (out << 1) | (1 if acc[i] > 0 else 0)
    return out


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup: 64-bit fingerprints, 4-segment blocking
    (pigeonhole: ≤3 differing bits → at least one identical 16-bit
    segment), Hamming verification within blocks."""
    import ray.data as rd

    ds = _augmented_documents(sf_dir, mutated=True)

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = {"doc_id": [], "segment_id": [], "segment": [], "simhash": []}
        for doc_id, text in zip(df["doc_id"], df["text"]):
            sh = simhash64(_TOKEN_RE.findall((text or "").lower()))
            for seg in range(4):
                out["doc_id"].append(doc_id)
                out["segment_id"].append(seg)
                out["segment"].append((sh >> (seg * 16)) & 0xFFFF)
                out["simhash"].append(np.int64(sh - (1 << 63)))  # store signed
        return pd.DataFrame(out)

    sigs = ds.map_batches(sig_rows, batch_format="pandas")

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        rows = group[["doc_id", "simhash"]].drop_duplicates("doc_id").sort_values("doc_id")
        ids = rows["doc_id"].to_numpy()
        hs = rows["simhash"].to_numpy().astype(np.int64)
        out_a, out_b, dist = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d = int(bin((int(hs[i]) ^ int(hs[j])) & ((1 << 64) - 1)).count("1"))
                if d <= max_hamming:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    dist.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": dist})

    pairs = sigs.groupby(["segment_id", "segment"]).map_groups(block_pairs, batch_format="pandas")
    # a pair can surface from several segments → distinct
    return pairs.groupby(["id_a", "id_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """Within-source pairwise word-set Jaccard (SQL-checkable near-dup
    baseline): pairs (a<b) in the same ``source`` with J ≥ threshold."""
    import ray.data as rd

    ds = rd.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "source", "text"])

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        sets = [set(_TOKEN_RE.findall(t or "")) for t in g["text"]]
        out_a, out_b, jac = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                inter = len(sets[i] & sets[j])
                union = len(sets[i] | sets[j])
                if union and inter / union >= threshold:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
                    jac.append(float(round_half_away(pd.Series([inter / union]), 4).iloc[0]))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": jac})

    return ds.groupby("source").map_groups(pairs, batch_format="pandas")
