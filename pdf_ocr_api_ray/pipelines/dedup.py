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

from ._util import distinct_pairs, read_parquet_clean, round_half_away

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
_VERIFY_BUCKETS = 64


def dedup_minhash_lsh(sf_dir: str, jaccard_threshold: float = JACCARD_THRESHOLD):
    """MinHash+LSH near-dup detection: signature → band rows → bucketed
    collision scan → candidate pairs → distributed exact-Jaccard
    verification. Returns confirmed pairs (a < b) with their Jaccard.

    Only candidate pair *ids* are collected to the driver (they form
    the broadcast routing index for verification); each pair's two
    shingle-hash sets meet in a hash bucket of the verify exchange —
    document text never reaches the driver and is never re-read
    per-pair. At extreme candidate volumes the same routing runs as a
    distributed semi-join (Dataset.join on doc_id) — the driver then
    holds nothing; the collected-index form is the low-latency variant.
    """
    import ray

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

    # distributed candidate dedup BEFORE the driver collect: a
    # mass-duplicated text puts identical signatures in the same bucket
    # of EVERY band, so raw candidates repeat up to N_BANDS× — dedupe
    # in pair-hash buckets so the driver receives each pair once
    cand = distinct_pairs(
        bands.groupby("gb").map_groups(bucket_pairs, batch_format="pandas")
    ).to_pandas()
    if cand.empty:
        # uniform Dataset return type (Ray's to_pandas drops schema on
        # ANY empty dataset — a known engine-wide limitation, not ours)
        import ray.data as rd

        return rd.from_arrow(
            pa.schema(
                [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
            ).empty_table()
        )
    pairs = np.unique(cand[["id_a", "id_b"]].to_numpy(np.int64), axis=0)

    # routing index: doc_id → [(pair_idx, side)] — ids only, broadcast once
    roles: dict[int, list[tuple[int, int]]] = {}
    for pidx, (a, b) in enumerate(pairs):
        roles.setdefault(int(a), []).append((pidx, 0))
        roles.setdefault(int(b), []).append((pidx, 1))
    idx_ref = ray.put((pairs, roles))

    sets_schema = pa.schema(
        [
            ("vb", pa.int32()),
            # one row per (doc, verify-bucket): the doc's shingle set is
            # shipped ONCE per bucket it participates in, with its pair
            # memberships encoded alongside (pidx*2 + side) — O(k·B)
            # exchange volume for a k-duplicate cluster, not O(k²)
            ("roles", pa.list_(pa.int64())),
            ("hashes", pa.list_(pa.uint64())),
        ]
    )

    def emit_sets(t: pa.Table) -> pa.Table:
        _, role_map = ray.get(idx_ref)
        vb, roles_c, hashes_c = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            rs = role_map.get(int(doc_id))
            if not rs:
                continue
            hs = _shingle_hashes(_TOKEN_RE.findall(text or ""))
            by_vb: dict[int, list[int]] = {}
            for pidx, side in rs:
                by_vb.setdefault(pidx % _VERIFY_BUCKETS, []).append(pidx * 2 + side)
            for b, enc in by_vb.items():
                vb.append(b)
                roles_c.append(enc)
                hashes_c.append(hs)
        return pa.table(
            {
                "vb": pa.array(vb, pa.int32()),
                "roles": pa.array(roles_c, pa.list_(pa.int64())),
                "hashes": pa.array(hashes_c, pa.list_(pa.uint64())),
            },
            schema=sets_schema,
        )

    sets = ds.map_batches(emit_sets, batch_format="pyarrow")

    def verify_bucket(g: pa.Table) -> pa.Table:
        all_pairs, _ = ray.get(idx_ref)
        roles_l = g["roles"].to_pylist()
        hl = g["hashes"].to_pylist()
        by_pair: dict[int, list] = {}
        for k in range(len(roles_l)):
            hs = np.asarray(hl[k], dtype=np.uint64)
            for enc in roles_l[k]:
                pidx, side = divmod(int(enc), 2)
                by_pair.setdefault(pidx, [None, None])[side] = hs
        ka, kb, jac = [], [], []
        for p, (sa, sb) in by_pair.items():
            if sa is None or sb is None or sa.size == 0 or sb.size == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            j = inter / union
            if j >= jaccard_threshold:
                ka.append(int(all_pairs[p][0]))
                kb.append(int(all_pairs[p][1]))
                jac.append(j)
        return pa.table(
            {
                "id_a": pa.array(ka, pa.int64()),
                "id_b": pa.array(kb, pa.int64()),
                "jaccard": pa.array(
                    round_half_away(pd.Series(jac, dtype="float64"), 4).to_numpy()
                    if jac
                    else np.array([], dtype="float64"),
                    pa.float64(),
                ),
            }
        )

    return sets.groupby("vb").map_groups(verify_bucket, batch_format="pyarrow")


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
        seg_ids = np.tile(np.arange(4, dtype=np.int32), n)
        segs = (
            (sh[:, None] >> (np.arange(4, dtype=np.uint64) * np.uint64(16)))
            & np.uint64(0xFFFF)
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), 4),
                "segment_id": seg_ids,
                "segment": segs.ravel(),
                "simhash": np.repeat(sh.view(np.int64), 4),
                "gb": (
                    (segs.ravel().view(np.uint64) * np.uint64(4) + seg_ids.astype(np.uint64))
                    % NUM_SUPER_BUCKETS
                ).astype(np.int32),
            }
        )

    sigs = ds.map_batches(sig_rows, batch_format="pandas")

    def block_pairs(group: pd.DataFrame) -> pd.DataFrame:
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

    pairs = sigs.groupby("gb").map_groups(block_pairs, batch_format="pandas")
    # a pair can surface from up to 4 segments → bucketed vectorized
    # distinct (hamming identical wherever the pair surfaces)
    return distinct_pairs(pairs, keep_min="hamming")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5):
    """Within-source pairwise word-set Jaccard (SQL-checkable near-dup
    baseline): pairs (a<b) in the same ``source`` with J ≥ threshold."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "source", "text"])

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
