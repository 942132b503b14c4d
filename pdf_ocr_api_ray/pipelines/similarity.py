"""Similarity search over the ``embeddings`` table.

- ``ann_topk``: brute-force cosine top-k per probe vector — the probe
  matrix is broadcast once (tiny) and each batch does one float64
  matmul; per-probe top-k is a (probe_id) groupby over per-batch
  partial top-k rows (each batch emits ≤ k rows per probe, so the
  shuffle is k × probes × blocks, independent of corpus size).
- ``embedding_near_dup``: all-pairs cosine ≥ τ via the same broadcast
  pattern (brute force; an IVF/LSH-bucketed variant is the 10^9-vector
  scale path — bucket by coarse quantizer, compare within buckets).

Outputs carry ids + integer ranks only (no float columns) so results
hash identically across summation orders; ties are broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import distinct_pairs, read_parquet_clean


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


N_PROBES = 5
TOP_K = 10


def _smallest_by_vec_id(sf_dir: str, k: int) -> pd.DataFrame:
    """(vec_id, embedding) rows of the k globally-smallest vec_ids,
    computed DISTRIBUTED: a per-batch partial bottom-k (≤ k rows leave
    each block) followed by a sort+limit over the reduced set — the
    driver never reads the embeddings table; at 10^9 vectors the
    full-table ``pq.read_table`` this replaces would be a driver OOM
    for what is a k-row selection."""
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def partial(t: pa.Table) -> pa.Table:
        order = np.argsort(t["vec_id"].to_numpy(), kind="stable")[:k]
        return t.take(pa.array(order))

    reduced = ds.map_batches(partial, batch_format="pyarrow").sort("vec_id").limit(k)
    return reduced.to_pandas()


def _probe_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """The probe set: embeddings of the N_PROBES smallest vec_ids."""
    df = _smallest_by_vec_id(sf_dir, N_PROBES)
    ids = df["vec_id"].to_numpy()
    mat = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def ann_topk(sf_dir: str):
    """Top-10 cosine neighbors (excluding self) for each probe vector.
    Returns (probe_id, rank, neighbor_id)."""
    import ray.data as rd

    probe_ids, probes = _probe_matrix(sf_dir)
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    return ann_topk_impl(ds, probe_ids, probes)


def ann_topk_impl(ds, probe_ids, probes):
    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims = vecs @ probes.T  # (batch, n_probes)
        ids = df["vec_id"].to_numpy()
        out = []
        for p in range(len(probe_ids)):
            col = sims[:, p]
            mask = ids != probe_ids[p]  # exclude self
            cand_ids = ids[mask]
            cand_sims = col[mask]
            order = np.lexsort((cand_ids, -cand_sims))[:TOP_K]
            for i in order:
                out.append((int(probe_ids[p]), int(cand_ids[i]), float(cand_sims[i])))
        return pd.DataFrame(out, columns=["probe_id", "neighbor_id", "sim"])

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "probe_id": g["probe_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return partials.groupby("probe_id").map_groups(final_topk, batch_format="pandas")


def _augment(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic near-dup injection (the synthetic corpus has no
    duplicates): an exact copy (vec_id + 100_000) of every
    vec_id % 10 == 0. SQL-reproducible (plain UNION ALL)."""
    dup = df[df["vec_id"] % 10 == 0].copy()
    dup["vec_id"] = dup["vec_id"] + 100_000
    return pd.concat([df, dup], ignore_index=True)


N_PLANES = 8  # 2^8 = 256 LSH buckets
_PLANE_SEED = 0xA11CE
_PLANES_CACHE: dict[tuple[int, int], np.ndarray] = {}


def _planes(dim: int, seed: int = _PLANE_SEED) -> np.ndarray:
    key = (seed, dim)
    if key not in _PLANES_CACHE:
        _PLANES_CACHE[key] = np.random.RandomState(seed).standard_normal((N_PLANES, dim))
    return _PLANES_CACHE[key]


def _lsh_bucket(vecs: np.ndarray, seed: int = _PLANE_SEED) -> np.ndarray:
    """Hyperplane LSH bucket id per row (deterministic planes)."""
    signs = (vecs @ _planes(vecs.shape[1], seed).T) > 0
    return (signs @ (1 << np.arange(N_PLANES))).astype(np.int64)


N_PROBE_DUPS = 10


def _augment_probe_dups(df: pd.DataFrame, probe_ids) -> pd.DataFrame:
    """Deterministic neighbor structure for the LSH query (the raw
    corpus is isotropic noise, where sublinear search has nothing to
    find): N_PROBE_DUPS exact copies of every probe vector, ids
    200_000 + probe_id*100 + j. SQL-reproducible (plain UNION ALL).
    Identical vectors hash to the probe's own LSH bucket, so the
    planted top-k is recovered deterministically."""
    # the planted-id namespace starts at 200_000; a corpus whose real
    # vec_ids reach it would silently collide with the planted rows
    # (engine and oracle share the formula, so parity would still pass
    # while neighbor identities were corrupt) — fail loudly instead
    if len(df) and int(df["vec_id"].max()) >= 200_000:
        raise ValueError(
            "embeddings vec_id >= 200000 collides with the planted-duplicate "
            "id namespace; raise the id base in _augment_probe_dups"
        )
    keep = df[df["vec_id"].isin(list(map(int, probe_ids)))]
    outs = [df]
    for j in range(N_PROBE_DUPS):
        c = keep.copy()
        c["vec_id"] = 200_000 + c["vec_id"] * 100 + j
        outs.append(c)
    return pd.concat(outs, ignore_index=True)


def ann_topk_lsh(sf_dir: str, n_probe_buckets: int = 37):
    """The 10^9-vector scale path for ann_topk: hyperplane-LSH bucketing
    (256 buckets) with multi-probe — each corpus batch only compares
    vectors whose bucket is among the probe's ``n_probe_buckets``
    nearest buckets (by Hamming distance of the bucket codes; the default
    37 = all codes within Hamming ≤ 2 of 8 bits ≈ 14%% of buckets). Compare
    count drops ~bucket-fold vs brute force; on data with real neighbor
    structure near-neighbors share buckets w.h.p. (tests assert recall
    on structured corpora; on noise data recall ≈ scan fraction — an
    information-theoretic floor, not an implementation defect)."""
    import ray.data as rd

    probe_ids, probes = _probe_matrix(sf_dir)
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        lambda df: _augment_probe_dups(df, probe_ids), batch_format="pandas"
    )
    return ann_topk_lsh_impl(ds, probe_ids, probes, n_probe_buckets)


def ann_topk_lsh_impl(ds, probe_ids, probes, n_probe_buckets: int = 37):
    probe_buckets = _lsh_bucket(probes)

    # multi-probe: accept corpus buckets within small Hamming distance
    all_codes = np.arange(1 << N_PLANES)
    accept: dict[int, np.ndarray] = {}
    for p, code in enumerate(probe_buckets):
        ham = np.array([bin(int(code) ^ int(c)).count("1") for c in all_codes])
        accept[p] = all_codes[np.argsort(ham, kind="stable")][:n_probe_buckets]

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        codes = _lsh_bucket(vecs)
        ids = df["vec_id"].to_numpy()
        out = []
        for p in range(len(probe_ids)):
            mask = np.isin(codes, accept[p]) & (ids != probe_ids[p])
            if not mask.any():
                continue
            sims = vecs[mask] @ probes[p]
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, -sims))[:TOP_K]
            for i in order:
                out.append((int(probe_ids[p]), int(cand_ids[i]), float(sims[i])))
        return pd.DataFrame(out, columns=["probe_id", "neighbor_id", "sim"])

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        # float64 dot products differ by an ulp depending on memory
        # alignment (SIMD path), which would make tie ranks (planted
        # exact duplicates, cos = 1) nondeterministic — quantize before
        # ranking; the id tiebreak then matches the SQL oracle exactly
        g["sim"] = np.round(g["sim"].to_numpy(), 9)
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "probe_id": g["probe_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return partials.groupby("probe_id").map_groups(final_topk, batch_format="pandas")


def _kmeans_centroids(mat: np.ndarray, k: int = 16, iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on a (normalized) sample — the
    IVF coarse quantizer. Init = first k sample rows (sample order is
    vec_id order → reproducible); empty cells keep their centroid."""
    cents = mat[:k].copy()
    for _ in range(iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                n = np.linalg.norm(v)
                if n > 1e-12:
                    cents[c] = v / n
    return cents


IVF_CELLS = 16
IVF_SAMPLE = 512

_KMEANS_Q = 1e9  # fixed-point unit for distributed partial sums


def _kmeans_centroids_distributed(
    sf_dir: str, k: int = IVF_CELLS, iters: int = 4
) -> np.ndarray:
    """Distributed Lloyd iterations for the IVF coarse quantizer over
    the WHOLE corpus — the 10⁹-vector training path (the default query
    trains on a bounded sample, which is oracle-identical and cheap;
    this is the quality option when the sample can't represent the
    distribution). Per round: centroids broadcast once (``ray.put``),
    each batch assigns its vectors and emits per-(cell, dim) partial
    sums, one bounded groupby (k × dim keys) reduces them, the driver
    renormalizes k centroids. Partial sums are accumulated in
    FIXED-POINT int64 (1e-9 units): integer addition is associative,
    so the trained centroids are bit-deterministic under any batch
    order / parallelism — float partials would drift by summation
    order and make cell assignments flicker run-to-run.

    Init: the k smallest vec_ids' vectors (same rule as the sample
    trainer) — deterministic. Empty cells keep their centroid.

    Per-round reduction: the partial sums form a FIXED (k × dim) int64
    matrix, so each round merges through the shared in-cluster
    ``elementwise_fold`` ADD (driver receives one row per round). The
    earlier (cell, dim)-keyed groupby paid ~7 s of fixed aggregator
    ramp PER ITERATION at any scale (4-iteration training ≈ 40 s wall
    over 2,200 vectors); the fold is scan-dominated. Integer addition
    is associative either way — trained centroids are bit-identical."""
    import ray

    from ._util import elementwise_fold

    init = _smallest_by_vec_id(sf_dir, k)
    cents = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-30)
    dim = cents.shape[1]

    # iterative consumer: each Lloyd round is a full dataset execution,
    # so pin the read's blocks in the (spill-backed) object store once
    # instead of re-reading parquet per round — the standard pattern
    # for iterative algorithms; values are unchanged (the fold is
    # bit-deterministic either way) but iters-1 read ramps disappear
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["embedding"]).materialize()

    for _ in range(iters):
        cents_ref = ray.put(cents)

        def partial(df: pd.DataFrame) -> np.ndarray:
            c = ray.get(cents_ref)
            vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
            vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
            assign = np.argmax(vecs @ c.T, axis=1)
            out = np.zeros((len(c), dim), dtype=np.int64)
            # quantize per VECTOR, then sum the int64s — integer
            # addition is associative AND the per-vector rounding is
            # independent of how vectors land in batches, so the total
            # is invariant under any block partitioning (per-batch
            # quantization would tie the rounding error to batch
            # boundaries). Spherical k-means renormalizes, so only the
            # sum is needed (no count).
            q = np.floor(vecs * _KMEANS_Q + 0.5).astype(np.int64)
            np.add.at(out, assign, q)
            return out

        qsums = elementwise_fold(ds, partial, np.add, np.int64, (k, dim))
        new = cents.copy()
        v = qsums.astype(np.float64) / _KMEANS_Q
        nrm = np.linalg.norm(v, axis=1)
        live = nrm > 1e-12  # empty cells keep their centroid
        new[live] = v[live] / nrm[live, None]
        cents = new
    return cents


def ann_topk_ivf(sf_dir: str, n_probe_cells: int = 4, train: str = "sample"):
    """IVF variant of the ANN scale path: a coarse quantizer (spherical
    k-means, broadcast) partitions the corpus into cells; each probe
    scans only its ``n_probe_cells`` nearest cells. Same
    planted-duplicate corpus and output contract as ``ann_topk_lsh`` —
    an exact copy of a probe is assigned to the probe's own nearest
    cell, so the planted top-k is recovered deterministically and the
    brute-force SQL oracle applies unchanged (under EITHER trainer:
    the output contract doesn't depend on centroid quality).

    ``train``: "sample" (default) trains driver-side on the IVF_SAMPLE
    smallest vec_ids — bounded, cheap, the right call when a sample
    represents the distribution; "full" runs distributed fixed-point
    Lloyd iterations over the whole corpus
    (``_kmeans_centroids_distributed``) — the 10⁹-vector option."""
    probe_ids, probes = _probe_matrix(sf_dir)
    if train == "full":
        cents = _kmeans_centroids_distributed(sf_dir, IVF_CELLS)
    else:
        # k-means training sample: the IVF_SAMPLE smallest vec_ids,
        # selected distributed (no driver full-table read)
        sample = _smallest_by_vec_id(sf_dir, IVF_SAMPLE)
        smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
        smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-30)
        cents = _kmeans_centroids(smat, IVF_CELLS)

    # per probe: the n_probe_cells nearest cells (ties by cell id)
    sims_pc = probes @ cents.T
    probe_cells = np.argsort(-sims_pc, axis=1, kind="stable")[:, :n_probe_cells]

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        lambda df: _augment_probe_dups(df, probe_ids), batch_format="pandas"
    )

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cells = np.argmax(vecs @ cents.T, axis=1)
        ids = df["vec_id"].to_numpy()
        out = []
        for p in range(len(probe_ids)):
            mask = np.isin(cells, probe_cells[p]) & (ids != probe_ids[p])
            if not mask.any():
                continue
            sims = vecs[mask] @ probes[p]
            cand_ids = ids[mask]
            order = np.lexsort((cand_ids, -sims))[:TOP_K]
            for i in order:
                out.append((int(probe_ids[p]), int(cand_ids[i]), float(sims[i])))
        return pd.DataFrame(out, columns=["probe_id", "neighbor_id", "sim"])

    partials = ds.map_batches(partial_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        g["sim"] = np.round(g["sim"].to_numpy(), 9)  # see ann_topk_lsh_impl
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(TOP_K)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "probe_id": g["probe_id"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    return partials.groupby("probe_id").map_groups(final_topk, batch_format="pandas")


def embedding_near_dup(sf_dir: str, threshold: float = 0.9, n_tables: int = 1):
    """Cosine near-duplicates over the augmented corpus (id_a < id_b,
    cos ≥ τ) — the 10^9-vector pairs path: hyperplane-LSH bucketing
    (256 buckets per table) + within-bucket exact cosine verification.
    One shuffle carries (table, bucket, id, vector); no full-corpus
    broadcast, no driver materialization.

    Near-dup vectors at cos ≈ 1 share a bucket deterministically
    (identical codes) — one table is exact for that regime and is the
    default. For recall on *boundary* pairs (cos just above τ, where a
    hyperplane can fall between the two vectors with probability
    ≈ N_PLANES·arccos(τ)/π per table) pass ``n_tables > 1``: each
    table hashes with an independent plane set and surviving pairs are
    deduped in hash buckets. tests/test_similarity.py cross-checks
    both modes against the brute-force oracle below."""
    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        _augment, batch_format="pandas"
    )

    def add_buckets(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        outs = []
        for tbl in range(n_tables):
            d = df.copy()
            # composite key: table id in the high bits — one groupby
            d["bucket"] = _lsh_bucket(vecs, _PLANE_SEED ^ tbl) + (tbl << N_PLANES)
            outs.append(d)
        return pd.concat(outs, ignore_index=True)

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="int64"), "id_b": pd.Series([], dtype="int64")}
            )
        vecs = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims = vecs @ vecs.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"id_a": ids[ai].astype("int64"), "id_b": ids[bi].astype("int64")}
        )

    pairs = (
        ds.map_batches(add_buckets, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
    )
    if n_tables == 1:
        return pairs  # a pair appears in exactly one bucket
    # cross-table duplicates → shared bucketed vectorized distinct
    return distinct_pairs(pairs)


def embedding_near_dup_bruteforce(sf_dir: str, threshold: float = 0.9):
    """All-pairs brute force — the small-scale oracle for the LSH path
    above (corpus matrix broadcast once; one matmul per batch)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    full = _augment(t.to_pandas())
    all_ids = full["vec_id"].to_numpy()
    mat = np.stack(full["embedding"].to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    corpus_ref = ray.put((all_ids, mat))

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"]).map_batches(
        _augment, batch_format="pandas"
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        ids_all, corpus = ray.get(corpus_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims = vecs @ corpus.T
        rows_ids = df["vec_id"].to_numpy()
        ai, bi = np.nonzero(sims >= threshold)
        out_a, out_b = [], []
        for i, j in zip(ai, bi):
            a, b = int(rows_ids[i]), int(ids_all[j])
            if a < b:
                out_a.append(a)
                out_b.append(b)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    return ds.map_batches(pairs, batch_format="pandas")


def knn_graph(sf_dir: str, k: int = 5):
    """Exact k-nearest-neighbor graph over the embeddings table: for
    EVERY vector, its top-``k`` cosine neighbors (self excluded) —
    the curation primitive behind graph-based clustering and
    density-based quality scoring. Output: (vec_id, rank, neighbor_id).

    This is the brute-force BASELINE (the exactness anchor the ANN ops
    are judged against): the corpus matrix is broadcast ONCE via
    ``ray.put`` (zero-copy numpy out of plasma in every task) and each
    batch computes one (batch × corpus) matmul + vectorized per-row
    top-k. Exact all-pairs KNN is inherently O(N²·d) — at 10^9+
    vectors route the graph through ``ann_topk_ivf``/``ann_topk_lsh``
    (bucketed, same output contract) instead; this op is bounded by
    corpus-matrix memory (N × d × 8 B) and is the right tool up to
    ~10^7 vectors per cluster.

    Rank order is (cosine DESC, neighbor_id ASC); the SQL twin ranks on
    ``round(sim, 9)`` — the same ulp-washing contract the long-green
    ``ann_topk`` oracle uses."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    all_ids = t["vec_id"].to_numpy()
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    corpus_ref = ray.put((all_ids.astype(np.int64), mat))

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def batch_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_all, corpus = ray.get(corpus_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims = vecs @ corpus.T  # (batch, N)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        # exclude self by id (the corpus has unique vec_ids)
        self_mask = ids[:, None] == ids_all[None, :]
        sims[self_mask] = -np.inf
        # rank on round(sim, 9) — the twin's ulp-washed key — so the
        # top-k boundary tie SET matches the oracle bit-for-bit, not
        # just up to <1e-9 raw-float daylight
        sims = np.round(sims, 9)
        # per-row top-k: argpartition then exact (sim DESC, id ASC) order
        part = np.argpartition(-sims, kth=min(k, sims.shape[1] - 1) - 1, axis=1)[:, :k]
        rows = np.repeat(np.arange(len(ids)), part.shape[1])
        cand_s = sims[rows, part.ravel()]
        cand_i = ids_all[part.ravel()]
        order = np.lexsort((cand_i, -cand_s, rows))
        rows_o, cand_i_o = rows[order], cand_i[order]
        return pd.DataFrame(
            {
                "vec_id": ids[rows_o],
                "rank": np.tile(np.arange(1, k + 1, dtype=np.int64), len(ids)),
                "neighbor_id": cand_i_o,
            }
        )

    return ds.map_batches(batch_topk, batch_format="pandas")


def hard_negatives(sf_dir: str, k: int = 5):
    """Hard-negative mining for retrieval / contrastive training
    (ANCE, Xiong et al. 2021; DPR, Karpukhin et al. 2020): for EVERY
    vector, the top-``k`` most cosine-similar vectors with a DIFFERENT
    label — the near-miss impostors that make the strongest training
    negatives. Output: (vec_id, rank, neg_id).

    Same scale shape as ``knn_graph`` (the corpus matrix + labels
    broadcast once via ``ray.put``, one (batch × corpus) matmul per
    batch, vectorized per-row top-k); the label mask also removes
    self. At 10⁹ vectors mine from ``ann_topk_ivf``'s candidate cells
    instead — this exact path is the anchor the ANN variant is judged
    against, bounded by corpus-matrix memory like ``knn_graph``.

    Rank order is (cosine DESC, neg_id ASC); the SQL twin ranks on
    ``round(sim, 9)`` — the ulp-washing contract shared with
    ``knn_graph`` / ``ann_topk``."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )
    all_ids = t["vec_id"].to_numpy()
    all_labels = t["label"].to_numpy()
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
    corpus_ref = ray.put(
        (all_ids.astype(np.int64), all_labels.astype(np.int64), mat)
    )

    ds = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )

    def batch_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids_all, labels_all, corpus = ray.get(corpus_ref)
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims = vecs @ corpus.T  # (batch, N)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        labels = df["label"].to_numpy(dtype=np.int64)
        # negatives only: same-label candidates (including self) masked
        sims[labels[:, None] == labels_all[None, :]] = -np.inf
        # ulp-wash to the twin's round(sim, 9) key (see knn_graph)
        sims = np.round(sims, 9)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(ids)), part.shape[1])
        cand_s = sims[rows, part.ravel()]
        cand_i = ids_all[part.ravel()]
        order = np.lexsort((cand_i, -cand_s, rows))
        rows_o, cand_i_o, cand_s_o = rows[order], cand_i[order], cand_s[order]
        # a label owning > N-k vectors leaves < k negatives: drop the
        # -inf fillers and rank the survivors 1..m per row
        finite = np.isfinite(cand_s_o)
        rows_f, negs_f = rows_o[finite], cand_i_o[finite]
        first = np.searchsorted(rows_f, np.arange(len(ids)), side="left")
        rank = np.arange(len(rows_f), dtype=np.int64) - first[rows_f] + 1
        return pd.DataFrame(
            {"vec_id": ids[rows_f], "rank": rank, "neg_id": negs_f}
        )

    return ds.map_batches(batch_topk, batch_format="pandas")

def hard_negatives_ann(
    sf_dir: str,
    k: int = 5,
    n_probe_cells: int = 4,
    train: str = "sample",
    cell_shards: int = 1,
    n_cells: int = IVF_CELLS,
):
    """The 10⁹-vector scale path for hard-negative mining: for EVERY
    vector, the top-``k`` most cosine-similar vectors with a DIFFERENT
    label, mined from the vector's ``n_probe_cells`` nearest IVF cells
    with exact re-ranking within the candidate set — the retrieval
    stage a contrastive-training pipeline (ANCE / DPR) runs where the
    brute-force ``hard_negatives`` anchor (corpus broadcast + O(N²)
    matmul) stops fitting.

    Scale shape — NO corpus broadcast, NO all-pairs: the coarse
    quantizer (spherical k-means, same trainers as ``ann_topk_ivf``)
    is the only driver-side state; ONE scan tags each vector with its
    home cell (a member row) and with each of its ``n_probe_cells``
    nearest cells (query rows), ONE cell-keyed groupby co-locates
    queries with candidates (each member lives in exactly one cell, so
    a (query, candidate) pair is scored at most once — partials need
    no dedup), each cell group does one (queries × members) matmul +
    per-query partial top-k (≤ k rows per query per cell leave the
    group), and a final vec_id groupby merges partials into exact
    within-candidates ranks. Shuffle volume: (n_probe_cells + 1) × N
    embedding rows — linear in the corpus, never quadratic.

    Rank order is (round(sim, 9) DESC, neg_id ASC) — the ulp-washed
    contract shared with ``knn_graph`` / ``hard_negatives``. With
    ``n_probe_cells = IVF_CELLS`` every cell is probed, the candidate
    set is the full different-label corpus, and the output equals the
    brute-force twin BIT-FOR-BIT (the driver parity row runs this
    configuration: the registry corpus is isotropic noise, where
    pruned probing has no planted structure to find); the pruned
    default's recall vs the exact anchor is pinned ≥ 0.95 on
    planted-cluster corpora in tests/test_similarity.py.

    Partitioning assumption (the knob that keeps total COMPUTE linear,
    not just the shuffle): per-cell work is |queries probing the cell|
    × |cell|, so with a FIXED quantizer the self-join is N²/cells. At
    scale, grow ``IVF_CELLS`` ∝ N (constant expected cell size — the
    standard IVF sizing, cells ≈ √N·c or N/target_cell_size) so total
    work stays ≈ N × n_probe × target_cell_size — linear. The sandbox
    pins the 16-cell configuration's correctness (full-probe ≡ brute
    force) and the routing/co-location shape; the cell count is the ``n_cells``
    parameter.

    ``cell_shards`` is the HOT-CELL skew lever: a skewed embedding
    distribution can pile most of the corpus into one k-means cell,
    making that one group O(|cell| × queries-probing-it). With
    ``cell_shards = s`` each member lands in exactly one of the cell's
    ``s`` shards (by vec_id hash) and each query replicates to all
    ``s`` shards of its probed cells — candidate sets still partition
    (no pair scored twice), the output is BIT-IDENTICAL (pinned in
    pytest), the largest group shrinks ×s, and the price is s× more
    query-side rows. The default 1 fits balanced quantizers; raise it
    when cell-size telemetry shows skew."""
    import ray  # noqa: F401  (parity with sibling ops' import shape)

    if train == "full":
        cents = _kmeans_centroids_distributed(sf_dir, n_cells)
    else:
        sample = _smallest_by_vec_id(sf_dir, IVF_SAMPLE)
        smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
        smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-30)
        cents = _kmeans_centroids(smat, n_cells)
    n_probe = min(n_probe_cells, n_cells)
    shards = max(1, int(cell_shards))

    ds = read_parquet_clean(
        _t(sf_dir, "embeddings"), columns=["vec_id", "embedding", "label"]
    )

    def route(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims_c = vecs @ cents.T
        home = np.argmax(sims_c, axis=1).astype(np.int64)
        # query side: the n_probe nearest cells (ties by cell id —
        # argsort is stable on the negated sims)
        probe = np.argsort(-sims_c, axis=1, kind="stable")[:, :n_probe]
        n = len(df)
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        labels = df["label"].to_numpy(dtype=np.int64)
        emb = df["embedding"].to_numpy()
        # member key: one shard per vector; query keys: every shard of
        # every probed cell (rep = n_probe × shards rows per query)
        mkey = home * shards + ids % shards
        qkey = (
            probe[:, :, None] * shards
            + np.arange(shards, dtype=np.int64)[None, None, :]
        ).reshape(n, -1)
        rep = n_probe * shards
        out = pd.DataFrame(
            {
                "cell": np.concatenate([mkey, qkey.ravel()]),
                "role": np.repeat(
                    np.array([0, 1], dtype=np.int64), [n, n * rep]
                ),
                "vec_id": np.concatenate([ids, np.repeat(ids, rep)]),
                "label": np.concatenate([labels, np.repeat(labels, rep)]),
                "embedding": np.concatenate([emb, np.repeat(emb, rep)]),
            }
        )
        return out

    routed = ds.map_batches(route, batch_format="pandas")

    def cell_topk(group: pd.DataFrame) -> pd.DataFrame:
        members = group[group["role"] == 0]
        queries = group[group["role"] == 1]
        if not len(members) or not len(queries):
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "neg_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        mvec = np.stack(members["embedding"].to_numpy()).astype(np.float64)
        mvec /= np.maximum(np.linalg.norm(mvec, axis=1, keepdims=True), 1e-30)
        qvec = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
        qvec /= np.maximum(np.linalg.norm(qvec, axis=1, keepdims=True), 1e-30)
        sims = np.round(qvec @ mvec.T, 9)  # the twin's round(sim, 9) key
        qlab = queries["label"].to_numpy(dtype=np.int64)
        mlab = members["label"].to_numpy(dtype=np.int64)
        sims[qlab[:, None] == mlab[None, :]] = -np.inf  # masks self too
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qvec)), part.shape[1])
        cand_s = sims[rows, part.ravel()]
        finite = np.isfinite(cand_s)
        mids = members["vec_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "vec_id": queries["vec_id"].to_numpy(dtype=np.int64)[rows[finite]],
                "neg_id": mids[part.ravel()[finite]],
                "sim": cand_s[finite],
            }
        )

    partials = routed.groupby("cell").map_groups(cell_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["sim", "neg_id"], ascending=[False, True]
        ).head(k)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neg_id": g["neg_id"].to_numpy(dtype=np.int64),
            }
        )

    return partials.groupby("vec_id").map_groups(final_topk, batch_format="pandas")

def knn_graph_ann(
    sf_dir: str,
    k: int = 5,
    n_probe_cells: int = 4,
    train: str = "sample",
    cell_shards: int = 1,
    n_cells: int = IVF_CELLS,
):
    """The 10⁹-vector scale path for the exact kNN graph: for EVERY
    vector, the top-``k`` cosine neighbors (self excluded) mined from
    its ``n_probe_cells`` nearest IVF cells with exact re-ranking
    within candidates — same cell co-location machinery as
    ``hard_negatives_ann`` (ONE scan routes member+query rows, ONE
    cell-keyed groupby scores disjoint candidate sets, ONE vec_id
    groupby merges partials; shuffle volume (n_probe_cells + 1) × N,
    never the brute-force anchor's corpus broadcast + O(N²) matmul).

    Rank order is (round(sim, 9) DESC, neighbor_id ASC) — the shared
    ulp-washed contract. With ``n_probe_cells = IVF_CELLS`` the
    candidate set is the full corpus minus self and the output equals
    the brute-force twin BIT-FOR-BIT (the driver parity
    configuration); pruned-probe recall ≥ 0.95 vs the exact anchor is
    pinned on planted-cluster corpora in tests/test_similarity.py.
    ``cell_shards`` is the hot-cell skew lever shared with
    ``hard_negatives_ann`` (members shard by vec_id hash, queries
    replicate per shard; output bit-identical, largest group ÷ s);
    the linear-total-compute assumption is also shared: grow
    ``IVF_CELLS`` ∝ N at scale so expected cell size stays constant
    (see hard_negatives_ann)."""
    import ray  # noqa: F401

    if train == "full":
        cents = _kmeans_centroids_distributed(sf_dir, n_cells)
    else:
        sample = _smallest_by_vec_id(sf_dir, IVF_SAMPLE)
        smat = np.stack(sample["embedding"].to_numpy()).astype(np.float64)
        smat /= np.maximum(np.linalg.norm(smat, axis=1, keepdims=True), 1e-30)
        cents = _kmeans_centroids(smat, n_cells)
    n_probe = min(n_probe_cells, n_cells)
    shards = max(1, int(cell_shards))

    ds = read_parquet_clean(_t(sf_dir, "embeddings"), columns=["vec_id", "embedding"])

    def route(df: pd.DataFrame) -> pd.DataFrame:
        vecs = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        vecs /= np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims_c = vecs @ cents.T
        home = np.argmax(sims_c, axis=1).astype(np.int64)
        probe = np.argsort(-sims_c, axis=1, kind="stable")[:, :n_probe]
        n = len(df)
        emb = df["embedding"].to_numpy()
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        mkey = home * shards + ids % shards
        qkey = (
            probe[:, :, None] * shards
            + np.arange(shards, dtype=np.int64)[None, None, :]
        ).reshape(n, -1)
        rep = n_probe * shards
        return pd.DataFrame(
            {
                "cell": np.concatenate([mkey, qkey.ravel()]),
                "role": np.repeat(np.array([0, 1], dtype=np.int64), [n, n * rep]),
                "vec_id": np.concatenate([ids, np.repeat(ids, rep)]),
                "embedding": np.concatenate([emb, np.repeat(emb, rep)]),
            }
        )

    routed = ds.map_batches(route, batch_format="pandas")

    def cell_topk(group: pd.DataFrame) -> pd.DataFrame:
        members = group[group["role"] == 0]
        queries = group[group["role"] == 1]
        if not len(members) or not len(queries):
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        mvec = np.stack(members["embedding"].to_numpy()).astype(np.float64)
        mvec /= np.maximum(np.linalg.norm(mvec, axis=1, keepdims=True), 1e-30)
        qvec = np.stack(queries["embedding"].to_numpy()).astype(np.float64)
        qvec /= np.maximum(np.linalg.norm(qvec, axis=1, keepdims=True), 1e-30)
        sims = np.round(qvec @ mvec.T, 9)  # the twin's round(sim, 9) key
        qids = queries["vec_id"].to_numpy(dtype=np.int64)
        mids = members["vec_id"].to_numpy(dtype=np.int64)
        sims[qids[:, None] == mids[None, :]] = -np.inf  # self exclusion
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qvec)), part.shape[1])
        cand_s = sims[rows, part.ravel()]
        finite = np.isfinite(cand_s)
        return pd.DataFrame(
            {
                "vec_id": qids[rows[finite]],
                "neighbor_id": mids[part.ravel()[finite]],
                "sim": cand_s[finite],
            }
        )

    partials = routed.groupby("cell").map_groups(cell_topk, batch_format="pandas")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].to_numpy(dtype=np.int64),
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "neighbor_id": g["neighbor_id"].to_numpy(dtype=np.int64),
            }
        )

    return partials.groupby("vec_id").map_groups(final_topk, batch_format="pandas")
