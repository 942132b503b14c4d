"""Deduplication pipelines — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup (the large-scale training-data
operator set).

Corpus note: the synthetic ``documents`` table has no duplicate texts,
so exact/near-dup queries run over a deterministic *augmented* corpus —
the original docs plus an exact copy (doc_id + 1_000_000) of every
doc_id % 5 == 0 and, for near-dup paths, a mutated copy (one token
replaced) of every doc_id % 7 == 0. The augmentation is plain
column arithmetic, so SQL oracles reproduce it.

Scale design:
- token/shingle hashing is vectorized numpy over stable md5 token
  hashes (cached per worker; one md5 per *distinct* token, not one per
  shingle) — reproducible across processes, unlike Python's salted
  ``hash``;
- exact dedup = groupby(content-hash) keep-min — the only shuffle
  carries (hash, doc_id) pairs, not text;
- MinHash-LSH = shingle→minhash→band rows→bucketed collision scan→
  candidate pairs→**distributed** exact-Jaccard verification: only the
  candidate pair *ids* ever reach the driver (16 B/pair — the index
  that routes verification); shingle sets flow worker-to-worker keyed
  by pair bucket, and document text never leaves the corpus scan.
  Banding is 32 bands × 2 rows: P(candidate | J=0.6) ≈ 1 - 2e-7, so on
  a corpus whose true-pair Jaccards are ≥ 0.6 with a wide gap to the
  background (ours: planted ≥ 0.6 vs natural ≤ 0.14) the verified
  output equals the exact-Jaccard pair set — which is what the DuckDB
  oracle computes from first principles;
- SimHash = 64-bit count-weighted token-hash fingerprint, 4×16-bit
  pigeonhole blocking (exact for hamming ≤ 3), block scan amortized
  over 256 hash super-buckets with vectorized pairwise popcount —
  fingerprints are pure md5 arithmetic, so the SQL oracle recomputes
  them bit-for-bit and the all-pairs hamming join is the oracle;
- embedding near-dup lives in pipelines/similarity.py (LSH-bucketed).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from . import pairs as verify
from ._util import distinct_pairs, read_parquet_clean

_TOKEN_RE = re.compile(r"\S+")

N_HASHES = 64
N_BANDS = 32  # 32 bands × 2 rows — near-certain recall at J ≥ 0.6
_RNG = np.random.RandomState(0x5EED)
# odd multipliers → bijective affine maps over Z/2^64 (fast wraparound
# hashing; no big-int/object math in the signature loop)
_A = (_RNG.randint(0, 1 << 62, size=N_HASHES).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
_B = _RNG.randint(0, 1 << 62, size=N_HASHES).astype(np.uint64)

_SC1 = np.uint64(0x9E3779B97F4A7C15)
_SC2 = np.uint64(0xC2B2AE3D27D4EB4F)
_SC3 = np.uint64(0x165667B19E3779F9)

NUM_SUPER_BUCKETS = 256  # amortizes per-group Python over hash buckets

_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount for uint64 arrays (any shape)."""
    return _POP8[np.ascontiguousarray(x).view(np.uint8)].reshape(*x.shape, 8).sum(
        axis=-1, dtype=np.int64
    )


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _stable64(token: str) -> int:
    """Stable 64-bit token hash (md5 prefix, little-endian) — identical
    across processes/nodes, unlike builtin ``hash``; the SQL oracle
    rebuilds the same value from DuckDB's md5()."""
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "little")


_TOK_CACHE: dict[str, int] = {}


def _tok_hashes(tokens: list[str]) -> np.ndarray:
    """md5 hash per token occurrence, md5 computed once per distinct
    token per worker (the corpus vocabulary is tiny next to the text)."""
    if len(_TOK_CACHE) > 1_000_000:  # bound worker memory on huge vocabs
        # clear BEFORE filling so this call's tokens survive to the read
        _TOK_CACHE.clear()
    for t in tokens:
        if t not in _TOK_CACHE:
            _TOK_CACHE[t] = _stable64(t)
    return np.fromiter((_TOK_CACHE[t] for t in tokens), dtype=np.uint64, count=len(tokens))


def _shingle_hashes(tokens: list[str]) -> np.ndarray:
    """Unique 64-bit hashes of the 3-token shingles — the hash-space
    twin of the SQL oracle's string shingles (distinct strings map to
    distinct hashes w.h.p., so hash-set Jaccard = string-set Jaccard)."""
    if not tokens:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < 3:
        return np.array([_stable64(" ".join(tokens))], dtype=np.uint64)
    h = _tok_hashes(tokens)
    return np.unique(h[:-2] * _SC1 + h[1:-1] * _SC2 + h[2:] * _SC3)


def _augmented_documents(sf_dir: str, mutated: bool = False):
    """documents ∪ exact copies (id%5==0, +1_000_000) ∪ optionally
    mutated copies (id%7==0, +2_000_000, first token doubled)."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

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


def _minhash_sig(tokens: list[str]) -> np.ndarray:
    sh = _shingle_hashes(tokens)
    if sh.size == 0:
        return np.full(N_HASHES, np.iinfo(np.uint64).max, dtype=np.uint64)
    # (a*h + b) mod 2^64 for all permutations × shingles, min per permutation
    return (sh[None, :] * _A[:, None] + _B[:, None]).min(axis=1)


JACCARD_THRESHOLD = 0.6


def dedup_minhash_lsh(
    sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    *,
    max_broadcast_pairs: int | None = None,
):
    """MinHash+LSH near-dup detection: signature → band rows → bucketed
    collision scan → candidate pairs → distributed exact-Jaccard
    verification (``pairs.verify_jaccard_pairs``). Returns confirmed
    pairs (a < b) with their Jaccard.

    Verification auto-routes on candidate count: below the broadcast
    cap the pair ids form a driver-collected routing index (16 B/pair,
    ``ray.put`` once — the low-latency path); above it the pairs and
    shingle sets meet in two hash-partitioned ``Dataset.join``s and
    the driver holds nothing (the 10⁹-candidate path;
    tests/test_properties.py forces it and pins identical output).
    Document text never reaches the driver in either mode.
    """
    ds = _augmented_documents(sf_dir, mutated=True)
    rows_per_band = N_HASHES // N_BANDS

    def band_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        sig_mat = np.empty((n, N_HASHES), dtype=np.uint64)
        for j, text in enumerate(df["text"]):
            sig_mat[j] = _minhash_sig(_TOKEN_RE.findall(text or ""))
        bands = sig_mat.reshape(n, N_BANDS, rows_per_band)
        # polynomial fold over ALL rows of each band — complete for any
        # retuned (N_BANDS, rows_per_band), not just the current 32×2
        bh_u = np.zeros((n, N_BANDS), dtype=np.uint64)
        for k in range(rows_per_band):
            bh_u = bh_u * _SC1 + bands[:, :, k]
        bh = bh_u.view(np.int64)  # (n, bands)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), N_BANDS),
                "band_id": np.tile(np.arange(N_BANDS, dtype=np.int32), n),
                "band_hash": bh.ravel(),
                "gb": (
                    (bh.ravel().view(np.uint64) ^ np.tile(np.arange(N_BANDS, dtype=np.uint64), n))
                    % NUM_SUPER_BUCKETS
                ).astype(np.int32),
            }
        )

    bands = ds.map_batches(band_rows, batch_format="pandas")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # many (band_id, band_hash) buckets per super-bucket group —
        # per-key work is vectorized pandas, not one Ray group per key
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        sizes = group.groupby(["band_id", "band_hash"])["doc_id"].nunique()
        hot = sizes[sizes > 1].index
        if len(hot):
            sub = group.set_index(["band_id", "band_hash"]).loc[hot]
            for _, g in sub.groupby(level=[0, 1]):
                ids = np.unique(g["doc_id"].to_numpy())
                ii, jj = np.triu_indices(len(ids), k=1)
                out_a.append(ids[ii])
                out_b.append(ids[jj])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    # distributed candidate dedup BEFORE any routing: a mass-duplicated
    # text puts identical signatures in the same bucket of EVERY band,
    # so raw candidates repeat up to N_BANDS× — dedupe in pair-hash
    # buckets so each pair is routed once
    cand = distinct_pairs(bands.groupby("gb").map_groups(bucket_pairs, batch_format="pandas"))

    def make_sets(members_ref):
        """Per-doc shingle-hash sets (broadcast mode hashes only docs
        that appear in a candidate pair; join mode filters by joining)."""
        import ray

        def emit(t: pa.Table) -> pa.Table:
            members = ray.get(members_ref) if members_ref is not None else None
            ids, hashes = [], []
            for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
                if members is not None and int(doc_id) not in members:
                    continue
                ids.append(int(doc_id))
                hashes.append(_shingle_hashes(_TOKEN_RE.findall(text or "")))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "hashes": pa.array(hashes, pa.list_(pa.uint64())),
                },
                schema=verify.SETS_SCHEMA,
            )

        return ds.map_batches(emit, batch_format="pyarrow")

    kwargs = {}
    if max_broadcast_pairs is not None:
        kwargs["max_broadcast_pairs"] = max_broadcast_pairs
    return verify.verify_jaccard_pairs(make_sets, cand, jaccard_threshold, **kwargs)


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token features (stable md5 token hashes,
    occurrence-count weights, ties → 0 bit). Pure md5 arithmetic — the
    SQL oracle recomputes fingerprints bit-for-bit."""
    if not tokens:
        return 0
    uniq, counts = np.unique(np.array(tokens, dtype=object), return_counts=True)
    hv = _tok_hashes(list(uniq))
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((bits * 2 - 1) * counts[:, None].astype(np.int64)).sum(axis=0)
    out = 0
    for i in range(63, -1, -1):
        out = (out << 1) | (1 if acc[i] > 0 else 0)
    return out


def hamming_sig_frame(ids: np.ndarray, hashes: np.ndarray) -> pd.DataFrame:
    """Expand 64-bit fingerprints into the 4-segment pigeonhole rows
    the hamming-blocking exchange consumes (exact for hamming ≤ 3) —
    shared by dedup_simhash and the perceptual image-hash dedup."""
    n = len(ids)
    sh = hashes.astype(np.uint64)
    seg_ids = np.tile(np.arange(4, dtype=np.int32), n)
    segs = (
        (sh[:, None] >> (np.arange(4, dtype=np.uint64) * np.uint64(16)))
        & np.uint64(0xFFFF)
    ).astype(np.int64)
    return pd.DataFrame(
        {
            "doc_id": np.repeat(ids, 4),
            "segment_id": seg_ids,
            "segment": segs.ravel(),
            "simhash": np.repeat(sh.view(np.int64), 4),
            "gb": (
                (segs.ravel().view(np.uint64) * np.uint64(4) + seg_ids.astype(np.uint64))
                % NUM_SUPER_BUCKETS
            ).astype(np.int32),
        }
    )


def hamming_block_pairs(sigs, max_hamming: int):
    """Bucketed hamming-pair scan over a ``hamming_sig_frame`` Dataset:
    super-bucket groupby, per-bucket vectorized popcount with identical
    fingerprints collapsed to representatives, bucketed distinct."""

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
        return _hamming_block_pairs(group, max_hamming)

    pairs = sigs.groupby("gb").map_groups(block_pairs, batch_format="pandas")
    # a pair can surface from up to 4 segments → bucketed vectorized
    # distinct (hamming identical wherever the pair surfaces)
    return distinct_pairs(pairs, keep_min="hamming")


def dedup_simhash(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup: 64-bit fingerprints, 4-segment blocking
    (pigeonhole: ≤3 differing bits → at least one identical 16-bit
    segment — EXACT recall), Hamming verification within blocks.
    Blocks are amortized over 256 hash super-buckets (vectorized
    pairwise popcount inside, no per-key Ray group); identical
    fingerprints collapse to one representative before the pairwise
    scan, so a mass-duplicated segment bucket costs O(k) + the output
    pairs rather than a k² popcount matrix."""
    ds = _augmented_documents(sf_dir, mutated=True)

    def sig_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        sh = np.empty(n, dtype=np.uint64)
        for j, text in enumerate(df["text"]):
            sh[j] = np.uint64(simhash64(_TOKEN_RE.findall((text or "").lower())))
        return hamming_sig_frame(df["doc_id"].to_numpy(), sh)

    sigs = ds.map_batches(sig_rows, batch_format="pandas")
    return hamming_block_pairs(sigs, max_hamming)


def _hamming_block_pairs(group: pd.DataFrame, max_hamming: int) -> pd.DataFrame:
    out_a, out_b, dist = [], [], []
    for _, g in group.groupby(["segment_id", "segment"]):
        rows = g[["doc_id", "simhash"]].drop_duplicates("doc_id").sort_values("doc_id")
        if len(rows) < 2:
            continue
        ids = rows["doc_id"].to_numpy()
        hs = rows["simhash"].to_numpy().view(np.uint64)
        # collapse identical fingerprints: all intra-cluster pairs are
        # hamming 0; the pairwise popcount runs on representatives only
        uniq_h, inv = np.unique(hs, return_inverse=True)
        for u in range(len(uniq_h)):
            members = ids[inv == u]
            if len(members) > 1:
                ii, jj = np.triu_indices(len(members), k=1)
                out_a.append(members[ii])
                out_b.append(members[jj])
                dist.append(np.zeros(len(ii), dtype=np.int64))
        if len(uniq_h) > 1:
            xors = uniq_h[:, None] ^ uniq_h[None, :]
            hd = _popcount64(xors)
            ui, uj = np.nonzero(np.triu(hd <= max_hamming, k=1))
            for a_rep, b_rep in zip(ui, uj):
                ma = ids[inv == a_rep]
                mb = ids[inv == b_rep]
                ga, gbb = np.meshgrid(ma, mb, indexing="ij")
                fa, fb = ga.ravel(), gbb.ravel()
                lo = np.minimum(fa, fb)
                hi = np.maximum(fa, fb)
                out_a.append(lo)
                out_b.append(hi)
                dist.append(np.full(len(lo), hd[a_rep, b_rep], dtype=np.int64))
    if not out_a:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
    return pd.DataFrame(
        {
            "id_a": np.concatenate(out_a),
            "id_b": np.concatenate(out_b),
            "hamming": np.concatenate(dist),
        }
    )



def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.5,
    *,
    max_broadcast_pairs: int | None = None,
    max_df_tokens: int = 1_000_000,
):
    """Within-source pairwise word-set Jaccard: pairs (a<b) in the same
    ``source`` with J ≥ threshold — EXACT output via prefix-filtered
    AllPairs (Bayardo et al., WWW'07 / SSJoin), not an all-pairs scan:

    1. one pass computes global token document frequencies (per-batch
       pre-agg, vocabulary-sized shuffle), collected as the broadcast
       ordering map (df ≥ 2 only — df-1 tokens can't join a pair, and
       they default to df = 1 consistently on every worker);
    2. each doc sorts its token-hash set by (df, hash) — rarest first —
       and posts only its PREFIX of length n − ⌈t·n⌉ + 1 under that
       order. Lemma (SSJoin): any pair with overlap ≥ ⌈t·n⌉ shares a
       prefix token, so candidate generation is lossless; common tokens
       land in few prefixes, killing the stopword-posting-list blowup;
    3. candidates = same-source pairs meeting in a (source, token)
       posting list (+ the t·n_a ≤ n_b length filter), deduped in hash
       buckets, then exact-verified by ``pairs.verify_jaccard_pairs``
       (broadcast or Dataset.join routing, auto-switched).

    Replaces the r2 per-source O(n²) Python double loop — a source with
    10⁵ docs now costs posting lists + verified candidates instead of
    5×10⁹ set intersections, and no Ray group ever holds a whole
    source. The SQL oracle (exact all-pairs) is unchanged: prefix
    filtering is exact, so output is identical.

    The df ordering map is CAPPED at ``max_df_tokens`` via distributed
    top-K-by-df (partial-fold, never the full vocabulary on the
    driver); long-tail tokens beyond the cap default to df = 1. Still
    EXACT: the lemma needs only a fixed worker-consistent total order —
    df ordering merely minimizes candidates, and the hot tokens the cap
    retains are exactly the ones whose position matters
    (tests/test_dedup.py pins cap ≪ vocabulary ≡ uncapped).
    """
    import math

    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "source", "text"])

    sets_schema = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("source", pa.string()),
            ("hashes", pa.list_(pa.uint64())),
        ]
    )

    def tok_sets(t: pa.Table) -> pa.Table:
        ids, srcs, hashes = [], [], []
        for doc_id, src, text in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["text"].to_pylist()
        ):
            ids.append(int(doc_id))
            srcs.append(src)
            hashes.append(np.unique(_tok_hashes(_TOKEN_RE.findall(text or ""))))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "hashes": pa.array(hashes, pa.list_(pa.uint64())),
            },
            schema=sets_schema,
        )

    # the token-hash projection feeds THREE consumers (df pass, posting
    # pass, verify) — materialize it once instead of re-reading and
    # re-tokenizing the corpus per consumer. The projection is ~8 B per
    # distinct token occurrence (smaller than the text it replaces);
    # at extreme scale the object store spills it, which still beats
    # three full corpus scans + tokenizations
    toks_ds = ds.map_batches(tok_sets, batch_format="pyarrow").materialize()

    # pass 1: global token document frequencies → broadcast ordering map
    def df_partial(t: pa.Table) -> pa.Table:
        flat = np.concatenate(
            [np.asarray(h, dtype=np.uint64) for h in t["hashes"].to_pylist()]
            or [np.empty(0, dtype=np.uint64)]
        )
        uniq, counts = np.unique(flat, return_counts=True)
        return pa.table(
            {
                "h": pa.array(uniq.view(np.int64), pa.int64()),
                "partial": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    df_agg = (
        toks_ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("h")
        .aggregate(Sum("partial", alias_name="df"))
    )

    # CAP the broadcast ordering map to the hottest max_df_tokens
    # tokens — distributed top-K by (df desc, h asc), same partial-fold
    # pattern as relational.top_orders, so the driver never holds the
    # full vocabulary. EXACT under any cap: the SSJoin prefix lemma
    # needs only a total order that is consistent on every worker;
    # uncapped (long-tail) tokens all default to df = 1 and sort first
    # by hash — the same order everywhere — while the hot tokens the
    # cap retains keep their true df and stay OUT of prefixes, which
    # is where df ordering earns its candidate pruning.
    def df_local_topk(t: pa.Table) -> pa.Table:
        keep = pc.filter(t, pc.greater_equal(t["df"], 2))  # df-1 never joins a pair
        if keep.num_rows <= max_df_tokens:
            return keep
        idx = pc.select_k_unstable(
            keep, k=max_df_tokens, sort_keys=[("df", "descending"), ("h", "ascending")]
        )
        return keep.take(idx)

    df_pd = (
        df_agg.map_batches(df_local_topk, batch_format="pyarrow")
        .repartition(32)
        .map_batches(df_local_topk, batch_format="pyarrow")
        .repartition(1)
        .map_batches(df_local_topk, batch_format="pyarrow")
        .to_pandas()  # ≤ max_df_tokens rows regardless of vocabulary
    )
    # broadcast as PARALLEL SORTED ARRAYS, not a dict: numpy arrays are
    # zero-copy out of plasma (a dict would re-unpickle per ray.get) and
    # the per-doc lookup becomes one vectorized searchsorted.
    # All-unique-vocabulary corpora filter the aggregate EMPTY, and
    # to_pandas on an empty Ray dataset drops its columns — guard it
    if "h" not in df_pd.columns:
        df_pd = pd.DataFrame({"h": pd.Series([], dtype="int64"),
                              "df": pd.Series([], dtype="int64")})
    df_keys = df_pd["h"].to_numpy(np.int64).view(np.uint64)
    df_vals = df_pd["df"].to_numpy(np.int64)
    key_order = np.argsort(df_keys)
    df_ref = ray.put((df_keys[key_order], df_vals[key_order]))

    # pass 2: post prefix tokens (rarest-first order), bucketed
    def postings(t: pa.Table) -> pa.Table:
        df_keys_s, df_vals_s = ray.get(df_ref)
        pref_arrs, src_c, id_c, n_c, shash = [], [], [], [], []
        for doc_id, src, hs in zip(
            t["doc_id"].to_pylist(), t["source"].to_pylist(), t["hashes"].to_pylist()
        ):
            n = len(hs)
            if n == 0:
                continue
            arr = np.asarray(hs, dtype=np.uint64)
            # vectorized df lookup in the sorted capped map; misses
            # (long-tail tokens beyond the cap) take df = 1
            if df_keys_s.size:
                pos = np.minimum(
                    np.searchsorted(df_keys_s, arr), df_keys_s.size - 1
                )
                dfs = np.where(df_keys_s[pos] == arr, df_vals_s[pos], 1)
            else:
                dfs = np.ones(n, dtype=np.int64)
            order = np.lexsort((arr, dfs))  # (df, hash) ascending — rarest first
            plen = n - math.ceil(threshold * n - 1e-9) + 1
            prefix = arr[order[:plen]]
            pref_arrs.append(prefix)
            src_c.extend([src] * len(prefix))
            id_c.extend([int(doc_id)] * len(prefix))
            n_c.extend([n] * len(prefix))
            shash.append(np.full(len(prefix), _stable64(src or ""), dtype=np.uint64))
        if not pref_arrs:
            prefix_all = np.empty(0, dtype=np.uint64)
            sh_all = np.empty(0, dtype=np.uint64)
        else:
            prefix_all = np.concatenate(pref_arrs)
            sh_all = np.concatenate(shash)
        gb = ((prefix_all * _SC1) ^ sh_all) % np.uint64(NUM_SUPER_BUCKETS)
        return pa.table(
            {
                "gb": pa.array(gb.astype(np.int32), pa.int32()),
                "source": pa.array(src_c, pa.string()),
                "h": pa.array(prefix_all.view(np.int64), pa.int64()),
                "doc_id": pa.array(id_c, pa.int64()),
                "n_tok": pa.array(n_c, pa.int64()),
            }
        )

    posts = toks_ds.map_batches(postings, batch_format="pyarrow")

    def post_pairs(group: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, g in group.groupby(["source", "h"]):
            rows = g[["doc_id", "n_tok"]].drop_duplicates("doc_id").sort_values("doc_id")
            if len(rows) < 2:
                continue
            ids = rows["doc_id"].to_numpy()
            ns = rows["n_tok"].to_numpy()
            ii, jj = np.triu_indices(len(ids), k=1)
            # length filter: J ≥ t needs t·max(n_a,n_b) ≤ min(n_a,n_b)
            keep = (
                np.minimum(ns[ii], ns[jj])
                >= threshold * np.maximum(ns[ii], ns[jj]) - 1e-9
            )
            out_a.append(ids[ii][keep])
            out_b.append(ids[jj][keep])
        if not out_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    cand = distinct_pairs(posts.groupby("gb").map_groups(post_pairs, batch_format="pandas"))

    def make_sets(members_ref):
        def emit(t: pa.Table) -> pa.Table:
            members = ray.get(members_ref) if members_ref is not None else None
            ids, hashes = [], []
            for doc_id, hs in zip(t["doc_id"].to_pylist(), t["hashes"].to_pylist()):
                if members is not None and int(doc_id) not in members:
                    continue
                ids.append(int(doc_id))
                hashes.append(hs)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "hashes": pa.array(hashes, pa.list_(pa.uint64())),
                },
                schema=verify.SETS_SCHEMA,
            )

        return toks_ds.map_batches(emit, batch_format="pyarrow")

    kwargs = {}
    if max_broadcast_pairs is not None:
        kwargs["max_broadcast_pairs"] = max_broadcast_pairs
    return verify.verify_jaccard_pairs(make_sets, cand, threshold, **kwargs)


def _latest_label_round(checkpoint_dir: str):
    """Most recent COMPLETE label round under ``checkpoint_dir`` —
    (round, label_sum, parquet_dir), or None. A round is complete iff
    its ``_round.json`` manifest exists (written only after the parquet
    lands and the directory is atomically renamed into place)."""
    import json
    import os

    best = None
    if not os.path.isdir(checkpoint_dir):
        return None
    for name in os.listdir(checkpoint_dir):
        path = os.path.join(checkpoint_dir, name)
        man = os.path.join(path, "_round.json")
        if name.startswith("round_") and os.path.exists(man):
            meta = json.load(open(man))
            if best is None or meta["round"] > best[0]:
                best = (meta["round"], meta["label_sum"], path)
    return best


def _persist_label_round(checkpoint_dir: str, rnd: int, label_sum: int, labels):
    """Atomic per-round label checkpoint: parquet into a tmp dir, then
    manifest, then one rename — a killed writer leaves only tmp junk,
    never a half-round that a resume would trust."""
    import json
    import os
    import shutil

    final = os.path.join(checkpoint_dir, f"round_{rnd:04d}")
    if os.path.exists(final):
        return
    tmp = final + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    labels.write_parquet(tmp)
    with open(os.path.join(tmp, "_round.json"), "w") as f:
        json.dump({"round": rnd, "label_sum": int(label_sum)}, f)
    os.rename(tmp, final)


def dedup_clusters(
    sf_dir: str,
    jaccard_threshold: float = JACCARD_THRESHOLD,
    max_rounds: int = 20,
    num_join_partitions: int = 64,
    checkpoint_dir: str | None = None,
):
    """Near-dup CLUSTERING: connected components over the confirmed
    near-dup pair graph (``dedup_minhash_lsh`` edges — exact copies
    surface there at J = 1), one canonical representative (min doc_id)
    per component — what a real dedup pass keys survivor selection on
    when duplicates form chains (A≈B, B≈C but A≉C).

    Distributed min-label propagation: every node starts labeled with
    its own id; each round ships labels across edges with a
    hash-partitioned ``Dataset.join`` and keeps the per-node minimum
    (groupby-min). Converges in O(component diameter) rounds; the label
    SUM is strictly decreasing until fixpoint, so convergence is
    detected with a cheap aggregate instead of an old-vs-new join. All
    state is Dataset-resident — the driver sees only per-round scalar
    sums. Output: (doc_id, cluster_rep, cluster_size) for every doc in
    at least one pair.

    ``checkpoint_dir`` persists each round's label table (atomic
    parquet + manifest rename): a killed round-k run — including a
    loud non-convergence refusal — resumes AT round k instead of
    recomputing the propagation from scratch (edges re-derive
    deterministically from the input; only the iterative state is
    worth persisting). tests/test_dedup_clusters.py pins
    kill-and-resume ≡ uninterrupted.

    Driver-registry row since r4 (recursive-CTE closure oracle);
    tests/test_dedup_clusters.py also pins it against DuckDB from
    first principles.
    """
    import ray.data as rd
    from ray.data.aggregate import Count, Min, Sum

    from ._util import clamped_join_partitions

    nparts = clamped_join_partitions(num_join_partitions)

    pairs_ds = dedup_minhash_lsh(sf_dir, jaccard_threshold)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False)
        b = t["id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, b]), pa.int64()),
                "v": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    # repartition normalizes block schemas: upstream map_groups stages
    # pass through zero-COLUMN empty blocks (Ray drops the schema of an
    # empty block), and Arrow's hash join rejects a join input whose
    # block lacks the key column — observed as an intermittent
    # "No match ... for key field reference" on small corpora
    edges = (
        pairs_ds.map_batches(both_dirs, batch_format="pyarrow")
        .repartition(nparts)
        .materialize()
    )
    if edges.count() == 0:
        return rd.from_arrow(
            pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("cluster_rep", pa.int64()),
                    ("cluster_size", pa.int64()),
                ]
            ).empty_table()
        )

    def init_labels(t: pa.Table) -> pa.Table:
        uniq = np.unique(t["u"].to_numpy(zero_copy_only=False))
        return pa.table(
            {"node": pa.array(uniq, pa.int64()), "label": pa.array(uniq, pa.int64())}
        )

    # duplicate (node, node) rows across batches collapse in the first
    # round's groupby-min — no distinct pass needed up front
    labels = edges.map_batches(init_labels, batch_format="pyarrow")
    prev_sum = None
    start_round = 0
    if checkpoint_dir is not None:
        resumed = _latest_label_round(checkpoint_dir)
        if resumed is not None:
            start_round, prev_sum, part_dir = resumed
            labels = (
                read_parquet_clean(part_dir)
                .repartition(nparts)
                .materialize()
            )
    converged = False
    for rnd in range(start_round, max_rounds):
        lab_v = labels.map_batches(
            lambda t: t.rename_columns(["v", "label"]), batch_format="pyarrow"
        )
        msgs = edges.join(lab_v, "inner", nparts, on=("v",)).map_batches(
            lambda t: pa.table({"node": t["u"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            # aggregate partitions can be empty (zero-column blocks) on
            # small graphs — normalize before the next round's join
            .repartition(nparts)
            .materialize()
        )
        cur = labels.aggregate(Sum("label", alias_name="s"))["s"]
        if checkpoint_dir is not None:
            _persist_label_round(checkpoint_dir, rnd + 1, cur, labels)
        if prev_sum is not None and cur == prev_sum:
            converged = True
            break
        prev_sum = cur
    if not converged:
        # min labels move one hop per round, so a component whose
        # diameter exceeds max_rounds would come back SPLIT — silently
        # wrong clusters. Refuse instead (chains longer than the
        # default bound are pathological; raise max_rounds to cover them).
        raise RuntimeError(
            f"label propagation did not reach its fixpoint within "
            f"{max_rounds} rounds — a near-dup component has diameter "
            f"> {max_rounds}; re-run with a larger max_rounds"
        )

    sizes = (
        labels.groupby("label")
        .aggregate(Count(alias_name="cluster_size"))
        .repartition(nparts)
    )
    out = labels.join(sizes, "inner", nparts, on=("label",))
    return out.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t["node"],
                "cluster_rep": t["label"],
                "cluster_size": pa.Array.from_pandas(
                    t["cluster_size"].to_pandas().astype("int64")
                ),
            }
        ),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Incremental dedup: new crawl increment vs an existing corpus
# ---------------------------------------------------------------------------

BLOOM_BITS = 1 << 20  # default filter size (128 KiB) — size to the BASE corpus


def _md5_digests(texts: pd.Series) -> list[bytes]:
    """16-byte content digests — the per-row kernel this operator family
    already pays in dedup_exact (the md5 IS the content identity)."""
    return [hashlib.md5(t.encode("utf-8")).digest() for t in texts.fillna("")]


def _probe_positions(digs: list[bytes], m_bits: int) -> np.ndarray:
    """(n, 4) Bloom probe positions: the md5's four big-endian uint32
    words mod m — k=4 independent probes per document, zero extra
    hashing (vectorized reinterpret of the digests)."""
    if not digs:
        return np.empty((0, 4), dtype=np.int64)
    arr = np.frombuffer(b"".join(digs), dtype=">u4").reshape(-1, 4)
    return (arr % np.uint32(m_bits)).astype(np.int64)


def dedup_incremental(sf_dir: str, mode: str = "bloom", m_bits: int = BLOOM_BITS):
    """Deduplicate a NEW crawl increment against an EXISTING corpus —
    the steady-state shape of production dedup (you do not re-shuffle
    100 TB of history to admit a 1 TB increment). Stand-in split over
    the augmented corpus (same arithmetic the SQL twin regenerates):
    base = the original documents; increment = the planted exact copies
    (dropped — their content exists in base) plus the mutated copies
    (kept — genuinely new content). Output: the surviving increment's
    (doc_id) rows. EXACT in both modes; bit-equal across modes (test).

    ``mode='bloom'`` (default — bounded increments, base scan-only):
    1. OR-fold a Bloom filter over base content digests through
       ``elementwise_fold`` (each block contributes one m/8-byte blob;
       the driver receives ONE row);
    2. probe the broadcast filter over the increment — hits are a
       guaranteed *superset* of true duplicates (Bloom has no false
       negatives); the driver collects only candidate (doc_id, digest)
       rows, bounded by |true dups| + fp·|increment|;
    3. exactness pass: a presence-vector OR-fold over base confirms
       which candidate digests actually occur (false positives die
       here — the same sketch-then-verify shape as heavy_hitters);
    4. one increment scan drops confirmed duplicates via a broadcast
       sorted id array.
    No keyed exchange anywhere. Size ``m_bits`` ≈ 1.44·|base|·log2(1/ε)
    bits: 10⁹ base docs at 1 % fp ≈ 1.2 GiB — still broadcastable.

    ``mode='antijoin'`` (the 10¹²-base path): when the filter itself
    outgrows broadcast, fall back to a hash-partitioned anti-join —
    distinct base digests (hash groupby) left-join the increment's
    digests; unmatched rows survive. Two keyed exchanges carrying
    (digest, id) only; text never moves."""
    import ray

    from ._util import clamped_join_partitions, elementwise_fold

    aug = _augmented_documents(sf_dir, mutated=True)

    # ONE text scan total: every later pass consumes the materialized
    # (doc_id, is_base, digest-hex) projection — ~49 B/row, object-store
    # resident — instead of re-reading and re-hashing document text.
    # (At 10^12 rows, dropping .materialize() trades the ~40 TB resident
    # projection for one extra text scan per pass — both layouts work;
    # the digest columns are what must flow either way.)
    def digest_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "is_base": ids < 1_000_000,
                "h": pd.array(
                    [d.hex() for d in _md5_digests(df["text"])], dtype="string"
                ),
            }
        )

    hashed = aug.map_batches(digest_rows, batch_format="pandas").materialize()
    base = hashed.map_batches(
        lambda df: df[df["is_base"]][["doc_id", "h"]], batch_format="pandas"
    )
    newd = hashed.map_batches(
        lambda df: df[~df["is_base"]][["doc_id", "h"]], batch_format="pandas"
    )

    if mode == "antijoin":
        from ray.data.aggregate import Count

        nparts = clamped_join_partitions(16)
        base_h = (
            base.groupby("h").aggregate(Count(alias_name="n_base")).repartition(nparts)
        )
        new_h = newd.repartition(nparts)
        joined = new_h.join(base_h, "left_outer", nparts, on=("h",))

        def survivors(t: pa.Table) -> pa.Table:
            # small-data joins can emit zero-COLUMN empty blocks (the
            # recorded map_groups/aggregate Arrow quirk) — normalize
            if t.num_rows == 0 or "doc_id" not in t.column_names:
                return pa.table({"doc_id": pa.array([], pa.int64())})
            return pa.table(
                {"doc_id": pc.cast(t["doc_id"].combine_chunks(), pa.int64())}
            ).filter(pc.is_null(t["n_base"].combine_chunks()))

        return joined.map_batches(survivors, batch_format="pyarrow")

    if mode != "bloom":
        raise ValueError(f"unknown mode: {mode!r}")

    def _col_digests(df: pd.DataFrame) -> list[bytes]:
        return [bytes.fromhex(h) for h in df["h"]]

    def bloom_batch(df: pd.DataFrame) -> np.ndarray:
        pos = _probe_positions(_col_digests(df), m_bits)
        arr = np.zeros(m_bits // 8, dtype=np.uint8)
        if pos.size:
            p = pos.ravel()
            np.bitwise_or.at(arr, p >> 3, (1 << (p & 7)).astype(np.uint8))
        return arr

    bloom = elementwise_fold(
        base, bloom_batch, np.bitwise_or, np.uint8, (m_bits // 8,)
    )
    bloom_ref = ray.put(bloom)  # numpy: zero-copy reads on every worker

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(bloom_ref)
        pos = _probe_positions(_col_digests(df), m_bits)
        hit = (((b[pos >> 3] >> (pos & 7)) & 1) == 1).all(axis=1)
        return df.loc[np.asarray(hit), ["doc_id", "h"]]

    cand = newd.map_batches(probe, batch_format="pandas").to_pandas()

    if len(cand):
        slot = {d: i for i, d in enumerate(dict.fromkeys(cand["h"]))}
        slot_ref = ray.put(slot)
        _slot_cache: dict = {}

        def present_batch(df: pd.DataFrame) -> np.ndarray:
            # non-numpy plasma objects re-deserialize per get — cache
            # the dict once per worker (same fix as pairs._verify)
            index = _slot_cache.get("s")
            if index is None:
                index = _slot_cache["s"] = ray.get(slot_ref)
            v = np.zeros(len(index), dtype=np.uint8)
            for d in df["h"]:
                j = index.get(d)
                if j is not None:
                    v[j] = 1
            return v

        present = elementwise_fold(
            base, present_batch, np.maximum, np.uint8, (len(slot),)
        )
        confirmed = {d for d, i in slot.items() if present[i]}
        dup_ids = np.sort(
            cand["doc_id"].to_numpy(dtype=np.int64)[
                np.fromiter(
                    (d in confirmed for d in cand["h"]), dtype=bool, count=len(cand)
                )
            ]
        )
    else:
        dup_ids = np.empty(0, dtype=np.int64)
    dup_ref = ray.put(dup_ids)

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        dup = ray.get(dup_ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        if len(dup):
            j = np.searchsorted(dup, ids)
            isdup = (j < len(dup)) & (dup[np.minimum(j, len(dup) - 1)] == ids)
        else:
            isdup = np.zeros(len(ids), dtype=bool)
        return pd.DataFrame({"doc_id": ids[~isdup]})

    return newd.map_batches(keep, batch_format="pandas")


def dedup_survivors(sf_dir: str, policy: str = "longest", **cluster_kwargs):
    """Survivor selection per near-dup cluster — the policy knob a
    production dedup pass applies AFTER clustering (C4 keeps the
    longest member of a duplicate group, not the smallest id):
    ``policy='longest'`` keeps the longest text (ties → smallest
    doc_id), ``policy='min_id'`` the canonical smallest id. Exact
    dups always tie on length, so the policies only diverge on
    near-dup chains — which is why this lives on the cluster graph.

    Distributed shape: the cluster table (bounded: docs in ≥1 pair)
    joins document lengths on a clamped hash partitioning, survivor
    argmax rides ONE int64 key (len·2⁴¹ + (2⁴¹−1−doc_id), so Max =
    longest-then-smallest-id — the encoded-argmax idiom from
    latest_order_per_customer), and a cluster-keyed groupby of two
    aggregates finalizes. Output: (cluster_rep, survivor_id,
    cluster_size) — one row per cluster."""
    from ray.data.aggregate import Max, Min

    from ._util import clamped_join_partitions

    clusters = dedup_clusters(sf_dir, **cluster_kwargs)

    if policy == "min_id":
        agg = clusters.groupby("cluster_rep").aggregate(
            Min("cluster_size", alias_name="cluster_size")
        )
        return agg.map_batches(
            lambda df: pd.DataFrame(
                {
                    "cluster_rep": df["cluster_rep"].astype("int64"),
                    "survivor_id": df["cluster_rep"].astype("int64"),
                    "cluster_size": df["cluster_size"].astype("int64"),
                }
            ),
            batch_format="pandas",
        )
    if policy != "longest":
        raise ValueError(f"unknown policy: {policy!r}")

    B = np.int64(1) << np.int64(41)

    lens = _augmented_documents(sf_dir, mutated=True).map_batches(
        lambda df: pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "ln": df["text"].fillna("").str.len().astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    nparts = clamped_join_partitions(16)
    joined = clusters.repartition(nparts).join(
        lens.repartition(nparts), "inner", nparts, on=("doc_id",)
    )

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "cluster_rep": df["cluster_rep"].astype("int64"),
                "k": df["ln"].to_numpy(dtype=np.int64) * B
                + (B - 1 - df["doc_id"].to_numpy(dtype=np.int64)),
                "cluster_size": df["cluster_size"].astype("int64"),
            }
        )

    agg = (
        joined.map_batches(enc, batch_format="pandas")
        .groupby("cluster_rep")
        .aggregate(
            Max("k", alias_name="k"),
            Min("cluster_size", alias_name="cluster_size"),
        )
    )

    def dec(df: pd.DataFrame) -> pd.DataFrame:
        k = df["k"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "cluster_rep": df["cluster_rep"].astype("int64"),
                "survivor_id": (B - 1 - (k % B)).astype(np.int64),
                "cluster_size": df["cluster_size"].astype("int64"),
            }
        )

    return agg.map_batches(dec, batch_format="pandas")


# ---------------------------------------------------------------------------
# ExactSubstr-style duplicated-substring removal (Lee et al. 2022)
# ---------------------------------------------------------------------------

SUBSTR_W = 8  # window length in tokens


def _flat_windows(texts: pd.Series, w: int):
    """Flatten a batch's texts into overlapping ``w``-token windows.

    Returns ``(tok_counts, win_row_idx, win_pos, win_strings)`` — per-row
    token counts, each window's row index, its starting TOKEN position
    within the row, and the space-joined window string. A row with fewer
    than ``w`` tokens contributes no windows (mirrors
    ``unnest(range(len(toks) - w + 1))`` in the SQL twin). Vectorized
    like ``curation._flat_grams`` (which this extends with positions):
    one explode + ``w - 1`` shifted object-array joins, no per-row loop.
    """
    toks = texts.str.findall(_TOKEN_RE)
    counts = toks.str.len().to_numpy(dtype=np.int64)
    empty = (
        counts,
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=np.int64),
        np.empty(0, dtype=object),
    )
    if counts.sum() == 0:
        return empty
    flat = np.concatenate([np.asarray(t, dtype=object) for t in toks if t])
    row_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    row_start = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=row_start[1:])
    if w == 1:
        pos = np.arange(len(flat), dtype=np.int64) - row_start[row_idx]
        return counts, row_idx, pos, flat
    if len(flat) < w:
        return empty
    # window starting at flat index i is valid iff token i+w-1 is in
    # the same row
    starts = np.flatnonzero(row_idx[: -(w - 1)] == row_idx[w - 1 :])
    if starts.size == 0:
        return empty
    parts = pd.Series(flat[starts], dtype=object)
    for j in range(1, w):
        parts = parts + " " + pd.Series(flat[starts + j], dtype=object)
    g_rows = row_idx[starts]
    return counts, g_rows, starts - row_start[g_rows], parts.to_numpy()


def dedup_substrings(
    sf_dir: str,
    w: int = SUBSTR_W,
    num_buckets: int = 256,
):
    """Cross-document duplicated-substring removal — the windowed
    ExactSubstr rule (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better", arXiv 2107.06499; their suffix-array
    maximal-match pass is the single-machine formulation — the fixed-
    width sliding-window variant below is the standard distributed
    approximation, and unlike §2's whole-document / disjoint-segment
    dedup it catches duplication at ANY token offset).

    Rule: every ``w``-token window occurrence whose exact window string
    occurs ≥2 times in the corpus — counting same-document repeats —
    is *duplicate-tagged* UNLESS it is the corpus-wide first occurrence
    (ordered by ``(doc_id, pos)``). A token is masked iff some
    duplicate-tagged occurrence covers it; each document is rebuilt
    from its unmasked tokens. Output: one row per document —
    ``(doc_id, n_tokens, n_masked, text_clean)``. First occurrences
    keep their text, so exactly one copy of every duplicated run
    survives — the paper's retain-one semantics.

    Scale shape — the ``dedup_segments`` idiom, TWO exchanges total,
    document text crossing the wire exactly ONCE:

    1. corpus scan → ``(h1, h2, ord)`` per window occurrence (24 B; md5
       window identity, never the window text). This is O(total tokens)
       rows — the honest cost of substring-level dedup; the per-token
       constant is what the suffix array also pays, just locally.
    2. tag selection — hash-bucketed groupby; within a bucket a sort +
       ``duplicated(keep='first')`` marks every non-first occurrence of
       each window (vectorized; ``ord = doc_id << 21 | pos`` makes
       lexicographic min == global first).
    3. tagged rows UNION document rows (typed Arrow tables), ONE
       doc-bucketed groupby co-locates each doc's text with its masked
       positions; the rebuild computes interval coverage with a single
       +1/−1 diff-array cumsum over the bucket's flattened tokens
       (windows never escape their document, so the running sum resets
       to zero at every document boundary by construction).

    The boilerplate augmentation (``curation.SEG_DUP_PHRASES``) plants
    cross-document duplicated runs exactly as for ``dedup_segments``;
    the DuckDB twin regenerates it and replays the rule with
    ``row_number() OVER (PARTITION BY win ORDER BY doc_id, pos)``.
    """
    from .curation import _SEG_IDX_BITS, _augment_boilerplate, _seg_hashes

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        texts = _augment_boilerplate(df["text"], ids)
        counts, rows, pos, wins = _flat_windows(texts, w)
        if len(pos) and (pos.max() >> _SEG_IDX_BITS):
            raise ValueError(f"document exceeds 2^{_SEG_IDX_BITS} tokens")
        h1, h2 = _seg_hashes(wins)
        return pd.DataFrame(
            {
                "h1": h1,
                "h2": h2,
                "b": (h1 % num_buckets).astype(np.int64),
                "ord": (ids[rows] << _SEG_IDX_BITS) | pos,
            }
        )

    def bucket_tagged(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["h1", "h2", "ord"])
        dup = g[g.duplicated(["h1", "h2"], keep="first")]
        ords = dup["ord"].to_numpy(dtype=np.int64)
        ids = ords >> _SEG_IDX_BITS
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "db": pa.array(ids % num_buckets, type=pa.int64()),
                "pos": pa.array(ords & ((1 << _SEG_IDX_BITS) - 1), type=pa.int64()),
                "text": pa.nulls(len(ids), type=pa.string()),
            }
        )

    tagged = (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("b")
        .map_groups(bucket_tagged, batch_format="pandas")
    )

    def doc_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "db": pa.array(ids % num_buckets, type=pa.int64()),
                "pos": pa.array(np.full(len(ids), -1), type=pa.int64()),
                "text": t["text"],
            }
        )

    unioned = ds.map_batches(doc_rows, batch_format="pyarrow").union(tagged)

    def rebuild(group: pd.DataFrame) -> pd.DataFrame:
        is_doc = group["pos"].to_numpy() < 0
        docs = group[is_doc]
        ids = docs["doc_id"].to_numpy(dtype=np.int64)
        texts = _augment_boilerplate(docs["text"], ids)
        counts, tok_rows, _, flat = _flat_windows(texts, 1)
        row_start = np.zeros(len(ids) + 1, dtype=np.int64)
        np.cumsum(counts, out=row_start[1:])
        t_ids = group["doc_id"].to_numpy(dtype=np.int64)[~is_doc]
        t_pos = group["pos"].to_numpy(dtype=np.int64)[~is_doc]
        order = np.argsort(ids, kind="stable")
        loc = order[np.searchsorted(ids[order], t_ids)]
        diff = np.zeros(int(counts.sum()) + 1, dtype=np.int64)
        np.add.at(diff, row_start[loc] + t_pos, 1)
        np.add.at(diff, row_start[loc] + t_pos + w, -1)
        covered = np.cumsum(diff[:-1]) > 0
        n_masked = np.bincount(tok_rows[covered], minlength=len(ids)).astype(np.int64)
        kept = pd.Series(flat[~covered]).groupby(tok_rows[~covered]).agg(" ".join)
        clean = np.full(len(ids), "", dtype=object)
        clean[kept.index.to_numpy()] = kept.to_numpy()
        return pd.DataFrame(
            {
                "doc_id": ids,
                "n_tokens": counts,
                "n_masked": n_masked,
                "text_clean": clean,
            }
        )

    return unioned.groupby("db").map_groups(rebuild, batch_format="pandas")


# ---------------------------------------------------------------------------
# cross-source n-gram overlap matrix


def source_overlap(sf_dir: str, n: int = 3, num_buckets: int = 256):
    """Exact cross-source n-gram overlap matrix — the dump-vs-dump
    contamination report (how much of crawl A's shingle space reappears
    in crawl B) that corpus curation runs before choosing mixing
    weights or dedup order. One row per source pair ``src_a < src_b``:
    ``(src_a, src_b, n_a, n_b, n_common, jaccard)`` over each source's
    DISTINCT n-gram set; a source with no n-gram-bearing documents has
    no set and is absent from the matrix (both engines).

    Scale shape: per-batch distinct ``(gram-md5, source)`` projection →
    ONE hash-bucketed exchange (same-hash rows co-locate, so each
    bucket computes global-distinct sets and pairwise co-occurrence
    locally: a self-merge on the gram hash bounded by sources-per-gram
    ≤ S) → a ≤ ``S² + S``-row groupby. The driver assembles the final
    matrix from that metadata-bounded table — S is the number of
    corpus sources (dumps), never corpus-scale. Gram hashing is md5
    per DISTINCT gram through hash-based factorize (the DSIR idiom);
    the SQL twin rebuilds the identical hash via DuckDB's md5, so even
    a 64-bit collision (which would merge two grams in BOTH engines
    the same way) cannot break parity.
    """
    import ray  # noqa: F401  (parity with sibling ops' lazy imports)

    from .curation import _flat_grams

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["source", "text"])

    def shingles(df: pd.DataFrame) -> pd.DataFrame:
        _, row_idx, grams = _flat_grams(df["text"].fillna(""), n)
        if not len(grams):
            return pd.DataFrame(
                {
                    "h": pd.Series([], dtype=np.uint64),
                    "source": pd.Series([], dtype=str),
                    "pb": pd.Series([], dtype=np.int32),
                }
            )
        # n-gram row_idx from _flat_grams indexes gram STARTS: map each
        # gram to its row's source
        src = df["source"].to_numpy(dtype=object)[row_idx]
        codes, uniq = pd.factorize(pd.Series(grams, dtype=object))
        hu = np.fromiter(
            (_stable64(g) for g in uniq), dtype=np.uint64, count=len(uniq)
        )
        out = pd.DataFrame({"h": hu[codes], "source": src}).drop_duplicates()
        out["source"] = out["source"].astype(str)
        out["pb"] = (out["h"] % num_buckets).astype(np.int32)
        return out

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        gg = g.drop_duplicates(["h", "source"])  # global distinct (co-located)
        sizes = gg["source"].value_counts()
        m = gg.merge(gg, on="h")  # ≤ S rows per gram each side
        m = m[m["source_x"] < m["source_y"]]
        inter = m.groupby(["source_x", "source_y"]).size()
        return pd.DataFrame(
            {
                "src_a": [*inter.index.get_level_values(0), *sizes.index],
                # "" is not a valid source value: marks per-source size rows
                "src_b": [*inter.index.get_level_values(1), *[""] * len(sizes)],
                "cnt": np.concatenate(
                    [inter.to_numpy(), sizes.to_numpy()]
                ).astype(np.int64)
                if len(inter) or len(sizes)
                else np.array([], dtype=np.int64),
            }
        )

    from ._util import smalltable_fold

    # per-bucket partials are ≤ S² + S rows each — a keyed aggregate
    # over them pays the fixed ~3 s aggregator ramp for nothing; the
    # small-table fold is scan-dominated
    agg = smalltable_fold(
        ds.map_batches(shingles, batch_format="pandas")
        .groupby("pb")
        .map_groups(bucket_pairs, batch_format="pandas"),
        lambda df: df.groupby(["src_a", "src_b"], as_index=False).agg(
            cnt=("cnt", "sum")
        ),
    )
    if "src_a" not in agg.columns:  # empty-Dataset schema loss guard
        agg = pd.DataFrame(
            {
                "src_a": pd.Series([], dtype=str),
                "src_b": pd.Series([], dtype=str),
                "cnt": pd.Series([], dtype="int64"),
            }
        )
    sizes = agg[agg["src_b"] == ""].set_index("src_a")["cnt"]
    inter = {
        (r.src_a, r.src_b): int(r.cnt)
        for r in agg[agg["src_b"] != ""].itertuples()
    }
    from itertools import combinations

    rows = []
    for a, b in combinations(sorted(sizes.index), 2):
        na, nb = int(sizes[a]), int(sizes[b])
        c = inter.get((a, b), 0)
        union = na + nb - c
        # exact ints + one division: bit-identical to the SQL twin
        rows.append((a, b, na, nb, c, c / union if union else float("nan")))
    return pd.DataFrame(
        rows, columns=["src_a", "src_b", "n_a", "n_b", "n_common", "jaccard"]
    ).astype({"n_a": "int64", "n_b": "int64", "n_common": "int64"})
