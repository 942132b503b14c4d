"""Sampling / selection / ordering operators for training-data
curation — deterministic stratified sampling (per-language mixture
fractions), fixed-size per-group sampling, per-group top-k exemplar
selection, the global epoch shuffle, and context-window packing.

All have DuckDB-oracle gates (tests/test_sampling.py +
tests/test_queries_vs_duckdb.py); most are driver-registry rows since
the r4 rotations.

Scale design: single-scan with bounded pre-reduction. Stratified
sampling is a pure per-row hash filter (no shuffle at all — the id
hash IS the random draw, reproducible on any worker); fixed-k and
top-k pre-reduce each batch to ≤ k rows per group before one bounded
groupby; the epoch shuffle's one unavoidable exchange carries
identities only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ._util import read_parquet_clean

DEFAULT_FRACTIONS = {"en": 0.5, "pt": 0.3}
DEFAULT_FRACTION = 0.2
_SAMPLE_SALT = "samp"


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _u32(doc_id: int) -> int:
    """Deterministic uniform draw in [0, 2^32): little-endian 64-bit
    md5 prefix of 'samp|<id>' masked to 32 bits — the same arithmetic
    the SQL oracle rebuilds from DuckDB's md5()."""
    h = hashlib.md5(f"{_SAMPLE_SALT}|{doc_id}".encode()).digest()[:8]
    return int.from_bytes(h, "little") & 0xFFFFFFFF


def sample_stratified(
    sf_dir: str,
    fractions: dict[str, float] | None = None,
    default_fraction: float = DEFAULT_FRACTION,
):
    """Stratified Bernoulli sample with per-language keep fractions
    (the training-mixture knob: upsample scarce languages, downsample
    dominant ones). The draw is a pure function of doc_id — no RNG
    state, no shuffle, reproducible across runs/cluster sizes, and a
    resumed run keeps exactly the same sample. Output: the sampled
    (doc_id, lang) rows."""
    fr = DEFAULT_FRACTIONS if fractions is None else fractions

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        thresh = df["lang"].map(lambda l: fr.get(l, default_fraction)).to_numpy()
        draws = np.fromiter(
            (_u32(int(d)) for d in df["doc_id"]), dtype=np.float64, count=len(df)
        )
        return df[draws < thresh * 2**32][["doc_id", "lang"]]

    return ds.map_batches(keep, batch_format="pandas")


def group_topk(sf_dir: str, k: int = 5):
    """Top-k documents per language by (n_chars DESC, doc_id ASC) —
    per-group exemplar selection. Each batch pre-reduces to ≤ k rows
    per language (so the shuffle carries k × languages × blocks rows,
    independent of corpus size), then one small groupby finalizes.
    Output: (lang, rank, doc_id, n_chars)."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return s.groupby("lang", sort=False).head(k)[["lang", "doc_id", "n_chars"]]

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        return pd.DataFrame(
            {
                "lang": g["lang"],
                "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                "doc_id": g["doc_id"].astype("int64"),
                "n_chars": g["n_chars"].astype("int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


_EPOCH_SALT = "epoch"


def epoch_shuffle(sf_dir: str, seed: int = 1):
    """Deterministic global training-order shuffle: every document gets
    an exact global ordinal ``pos`` in the order of
    ``md5('epoch|<seed>|<doc_id>')`` — the epoch permutation a training
    loader consumes. Pure function of (seed, doc_id): reproducible
    across runs, cluster sizes, and resumes; a new seed is a new epoch
    order with zero state carried over.

    A total order is the semantics, so ONE exchange is unavoidable —
    but it carries only (doc_id, 32-byte key) identities, never
    payloads, and no global sort-merge runs:

    1. per-batch bucket counts (bucket = the key's most significant
       byte, so bucket-major order IS key order) → a 256-row groupby —
       the driver sees 256 counts, never keys;
    2. driver cumsums the bucket offsets (bounded metadata);
    3. one bucketed groupby co-locates each bucket; an in-bucket sort
       on the full 128-bit key plus the bucket offset yields the exact
       global ordinal. Full-width keys matter: at 10^12 docs a 64-bit
       prefix would collide (birthday bound), a 128-bit one does not.

    Output: (doc_id, pos). The DuckDB twin is
    ``row_number() OVER (ORDER BY md5(...)) - 1`` — hex strings compare
    bytewise in both engines."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"])

    def _keys(ids: np.ndarray) -> np.ndarray:
        return np.array(
            [
                hashlib.md5(f"{_EPOCH_SALT}|{seed}|{int(d)}".encode()).hexdigest()
                for d in ids
            ],
            dtype=object,
        )

    from ._util import elementwise_fold

    def bucket_counts(df: pd.DataFrame):
        keys = _keys(df["doc_id"].to_numpy())
        b = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return np.bincount(b, minlength=256).astype(np.int64)

    # counts merge in-cluster via the shared sketch fold — the driver
    # receives ONE 256-count row. (Both Ray-native shapes measured far
    # worse at sf0.1 for this bounded metadata pass: groupby("b").sum
    # over 256-row partials ≈ 7 s of aggregator ramp, Dataset.sum over
    # 256 columns ≈ 8 s of per-column machinery; the fold is
    # scan-dominated.)
    per_bucket = elementwise_fold(ds, bucket_counts, np.add, np.int64, (256,))
    offsets = np.concatenate(([0], np.cumsum(per_bucket)[:-1]))

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        keys = _keys(df["doc_id"].to_numpy())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "b": np.array([int(k[:2], 16) for k in keys], dtype=np.int64),
                "key": keys,
            }
        )

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("key").reset_index(drop=True)
        base = offsets[int(g["b"].iloc[0])]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "pos": base + np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("b")
        .map_groups(rank, batch_format="pandas")
    )


def pack_sequences(sf_dir: str, max_tokens: int = 256, num_buckets: int = 64):
    """Greedy context-window packing — the training-data step that
    concatenates documents into fixed token budgets (one bin ≈ one
    training sequence). Global greedy packing is inherently sequential,
    so the scalable contract is bucket-local: docs hash to
    ``doc_id % num_buckets`` buckets, and each bucket packs its docs in
    doc_id order (next-fit: a doc joins the single currently-open bin
    if it fits, else opens a new one — earlier bins are never revisited;
    an oversized doc gets its own bin). Deterministic
    under any parallelism — bucket identity and fill order are pure
    functions of doc_id. Output: (doc_id, bucket, bin_id, n_tokens).

    The DuckDB oracle replays the identical fill rule with a recursive
    CTE (tests/test_sampling.py). Token counting uses the engine-wide
    ``\\S+`` tokenizer, which is parity-exact with DuckDB only on ASCII
    text (Python ``\\S`` is Unicode-aware, RE2's is not) — the same
    corpus assumption every text op relies on, guarded by
    tests/test_corpus_sql.py::test_vocab_is_filter_safe."""
    import re

    token_re = re.compile(r"\S+")
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def count_tokens(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "bucket": (df["doc_id"] % num_buckets).astype("int64"),
                "n_tokens": df["text"].str.count(token_re).astype("int64"),
            }
        )

    def pack(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy()
        bins = np.empty(len(n), dtype=np.int64)
        fill = 0
        b = 0
        for i, x in enumerate(n):
            if i > 0 and fill + x > max_tokens:
                b += 1
                fill = 0
            fill += x
            bins[i] = b
        g["bin_id"] = bins
        return g[["doc_id", "bucket", "bin_id", "n_tokens"]]

    return (
        ds.map_batches(count_tokens, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pack, batch_format="pandas")
    )


_FIX_SALT = "fix"


def sample_fixed_k(sf_dir: str, k: int = 10):
    """Deterministic FIXED-SIZE per-language sample: exactly
    ``min(k, n_lang)`` docs per language — the fixed-budget counterpart
    of ``sample_stratified``'s Bernoulli draw (a training mixture that
    needs exact per-language counts, e.g. eval-set carving, uses this).

    Distributed reservoir without reservoir state: the sample is the
    ``k`` SMALLEST md5 draws per language — an order statistic, so each
    batch pre-reduces to ≤ k rows per language (hex-string draws sort
    bytewise identically in numpy and SQL) and one bounded groupby
    finalizes. Deterministic, resume-stable, and independent of
    block layout. Ties (impossible for md5-distinct ids) break by
    doc_id. Output: (lang, doc_id).

    SQL twin: ``row_number() OVER (PARTITION BY lang ORDER BY
    md5('fix|' || doc_id), doc_id) <= k``."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def draws(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "lang": df["lang"],
                "doc_id": df["doc_id"].astype("int64"),
                "draw": [
                    hashlib.md5(f"{_FIX_SALT}|{int(d)}".encode()).hexdigest()
                    for d in df["doc_id"]
                ],
            }
        )
        s = out.sort_values(["draw", "doc_id"])
        return s.groupby("lang", sort=False).head(k)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["draw", "doc_id"]).head(k)
        return pd.DataFrame(
            {"lang": g["lang"], "doc_id": g["doc_id"].astype("int64")}
        )

    return (
        ds.map_batches(draws, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def write_epoch_shards(
    sf_dir: str,
    out_dir: str,
    num_shards: int = 16,
    seed: int = 1,
):
    """Resumable epoch-ordered training-shard output: documents land in
    ``num_shards`` parquet shards such that reading the shard files in
    name order, rows in file order, replays EXACTLY the
    ``epoch_shuffle`` permutation (shard = key's most-significant-byte
    range, rows sorted by full key within a shard).

    ONE exchange total — text moves once into its shard bucket; the
    per-shard write happens inside the group function with an atomic
    tmp→rename, so a killed run leaves only complete shards. A re-run
    SKIPS every shard whose directory exists (shard membership is a
    pure function of (seed, doc_id): resume-stable by construction) and
    rewrites only the missing ones; the returned summary + the manifest
    record per-shard lineage (n_docs, wall, skip/write).

    Output layout: ``out_dir/shard=SSSSS/part.parquet`` with columns
    (doc_id, key, text)."""
    import json
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    if 256 % num_shards:
        raise ValueError("num_shards must divide 256 (shard = key-byte range)")
    per = 256 // num_shards

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy()
        keys = np.array(
            [
                hashlib.md5(f"{_EPOCH_SALT}|{seed}|{int(d)}".encode()).hexdigest()
                for d in ids
            ],
            dtype=object,
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "key": keys,
                "text": df["text"],
                "shard": np.array(
                    [int(k[:2], 16) // per for k in keys], dtype=np.int64
                ),
            }
        )

    def write_shard(group: pd.DataFrame) -> pd.DataFrame:
        s = int(group["shard"].iloc[0])
        final_dir = os.path.join(out_dir, f"shard={s:05d}")
        if os.path.exists(final_dir):  # completed by an earlier run
            return pd.DataFrame(
                {"shard": [s], "n_docs": [len(group)], "status": ["skipped"],
                 "wall_s": [0.0]}
            )
        t0 = time.time()
        g = group.sort_values("key")
        tmp_dir = final_dir + ".tmp"
        os.makedirs(tmp_dir, exist_ok=True)
        pq.write_table(
            pa.Table.from_pandas(g[["doc_id", "key", "text"]], preserve_index=False),
            os.path.join(tmp_dir, "part.parquet"),
        )
        try:
            os.rename(tmp_dir, final_dir)
        except OSError:
            # a speculative retry of this task lost the rename race —
            # the shard content is a pure function of (seed, members),
            # so the winner's bytes are identical; treat as completed
            if not os.path.exists(final_dir):
                raise
            return pd.DataFrame(
                {"shard": [s], "n_docs": [len(g)], "status": ["skipped"],
                 "wall_s": [0.0]}
            )
        return pd.DataFrame(
            {"shard": [s], "n_docs": [len(g)], "status": ["written"],
             "wall_s": [round(time.time() - t0, 3)]}
        )

    os.makedirs(out_dir, exist_ok=True)
    summary = (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("shard")
        .map_groups(write_shard, batch_format="pandas")
        .to_pandas()
    )
    with open(os.path.join(out_dir, "manifest.jsonl"), "a") as f:
        for r in summary.to_dict("records"):
            f.write(json.dumps({**r, "seed": seed, "at": time.time()}) + "\n")
    return summary.sort_values("shard", ignore_index=True)


_SPLIT_SALT = "split"


def split_corpus(
    sf_dir: str,
    weights: tuple[int, int, int] = (98, 1, 1),
):
    """Deterministic train/validation/test holdout assignment — the
    split that must NEVER drift: membership is a pure function of
    doc_id (md5 draw mod the weight total), so it is identical across
    runs, cluster sizes, resumes, and corpus growth (a doc added later
    cannot move an existing doc between splits — the leakage failure
    mode of position- or RNG-based splitting). Shuffle-free single
    scan.

    ``weights`` are integer bucket widths (e.g. 98/1/1); the draw is
    the same 32-bit md5 arithmetic the SQL twin rebuilds. Output:
    (doc_id, lang, split) with split in {'train','val','test'}."""
    total = sum(weights)
    if total <= 0 or any(w < 0 for w in weights):
        raise ValueError("weights must be non-negative with a positive sum")
    b1, b2 = weights[0], weights[0] + weights[1]

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        draws = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(f"{_SPLIT_SALT}|{int(d)}".encode()).digest()[:8],
                    "little",
                )
                & 0xFFFFFFFF
                for d in df["doc_id"]
            ),
            dtype=np.int64,
            count=len(df),
        )
        bucket = draws % total
        split = np.where(bucket < b1, "train", np.where(bucket < b2, "val", "test"))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "lang": df["lang"],
                "split": split,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


_CURR_SALT = "curr"


def curriculum_order(sf_dir: str, seed: int = 1, stage_width: int = 100):
    """Curriculum training order: every document gets an exact global
    ordinal ``pos`` under (difficulty stage ASC, epoch-style md5 draw)
    — the shortest-first curriculum a loader consumes (Bengio et al.
    2009), with documents SHUFFLED within each stage so the model
    never sees a secondary systematic order. Stage = ``n_chars //
    stage_width`` (length as the difficulty proxy; any integer
    difficulty column drops in unchanged).

    Same identity-only total-order machinery as ``epoch_shuffle`` with
    a two-level key: one (stages × 256)-cell count fold gives the
    driver bounded offsets (never keys), one (stage, key-byte)-bucketed
    groupby sorts each bucket on the full 128-bit md5 and adds its
    offset. Output (doc_id, stage, pos); the twin is
    ``row_number() OVER (ORDER BY stage, md5(...)) - 1``."""
    from ._util import elementwise_fold

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
    # stages are data-dependent but bounded: fold the max stage first
    # (ONE int — the same bounded-metadata discipline as the counts)
    max_stage = int(
        elementwise_fold(
            ds,
            lambda df: np.array(
                [int((df["n_chars"].to_numpy(dtype=np.int64) // stage_width).max(initial=0))]
            ),
            np.maximum,
            np.int64,
            (1,),
        )[0]
    )
    n_stages = max_stage + 1

    def _keys(ids: np.ndarray) -> np.ndarray:
        return np.array(
            [
                hashlib.md5(f"{_CURR_SALT}|{seed}|{int(d)}".encode()).hexdigest()
                for d in ids
            ],
            dtype=object,
        )

    def cell_counts(df: pd.DataFrame):
        stage = df["n_chars"].to_numpy(dtype=np.int64) // stage_width
        keys = _keys(df["doc_id"].to_numpy())
        b = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        out = np.zeros(n_stages * 256, dtype=np.int64)
        np.add.at(out, stage * 256 + b, 1)
        return out

    per_cell = elementwise_fold(ds, cell_counts, np.add, np.int64, (n_stages * 256,))
    offsets = np.concatenate(([0], np.cumsum(per_cell)[:-1]))

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        stage = df["n_chars"].to_numpy(dtype=np.int64) // stage_width
        keys = _keys(df["doc_id"].to_numpy())
        b = np.array([int(k[:2], 16) for k in keys], dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "stage": stage,
                "cell": stage * 256 + b,
                "key": keys,
            }
        )

    def rank(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("key").reset_index(drop=True)
        base = offsets[int(g["cell"].iloc[0])]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "stage": g["stage"],
                "pos": base + np.arange(len(g), dtype=np.int64),
            }
        )

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .groupby("cell")
        .map_groups(rank, batch_format="pandas")
    )


RANK_BUCKETS = 1024  # range-partition width for global rank assignment


def rank_by_key(ds, key_col: str, num_buckets: int = RANK_BUCKETS):
    """Exact 0-based ascending rank of a UNIQUE int64 key column,
    LAYOUT-FREE — the kernel behind ``global_row_number`` and
    ``text.quality_deciles``. Adds a ``row_no`` column to ``ds``.

    Shape: a (2,) MIN/MAX fold sizes equal-width RANGE buckets, a (B,)
    histogram fold counts keys per bucket (driver state is B-bounded,
    never keys), exclusive prefix sums broadcast as per-bucket base
    offsets, and ONE range-bucket keyed exchange sorts each bucket
    locally — range buckets make local order globally correct. Skew
    note: equal-width buckets inherit the key distribution; for
    adversarial clustering raise ``num_buckets`` or pre-spread the key
    (the composite-key callers put the selective field in the high
    bits, so [min, max] adapts to the occupied range)."""
    import ray

    from ._util import elementwise_fold

    B = int(num_buckets)
    if B <= 0:
        raise ValueError("num_buckets must be positive")

    ds = ds.materialize()

    def minmax(df: pd.DataFrame) -> np.ndarray:
        k = df[key_col].to_numpy(np.int64)
        return np.array([k.min(), -k.max()], dtype=np.int64)

    mm = elementwise_fold(ds, minmax, np.minimum, np.int64, (2,))
    lo, hi = int(mm[0]), int(-mm[1])
    width = max(1, (hi - lo + B) // B)  # ceil((hi-lo+1)/B)

    hist = elementwise_fold(
        ds,
        lambda df: np.bincount(
            (df[key_col].to_numpy(np.int64) - lo) // width, minlength=B
        ).astype(np.int64),
        np.add,
        np.int64,
        (B,),
    )
    offsets = np.zeros(B, dtype=np.int64)
    np.cumsum(hist[:-1], out=offsets[1:])
    off_ref = ray.put(offsets)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["rb"] = ((df[key_col].to_numpy(np.int64) - lo) // width).astype(np.int32)
        return df

    def rank_bucket(group: pd.DataFrame, _o=off_ref) -> pd.DataFrame:
        offs = ray.get(_o)
        g = group.sort_values(key_col, ignore_index=True).drop(columns=["rb"])
        b = int((int(g[key_col].iloc[0]) - lo) // width)
        g["row_no"] = offs[b] + np.arange(len(g), dtype=np.int64)
        return g

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("rb")
        .map_groups(rank_bucket, batch_format="pandas")
    )


def global_row_number(sf_dir: str, num_buckets: int = RANK_BUCKETS):
    """Deterministic global row numbering — the distributed
    zipWithIndex every sharder/curriculum/sampler wants, defined
    LAYOUT-FREE: ``row_no`` is the 0-based rank of ``doc_id`` in
    ascending order (ids are unique), so the numbering is identical
    across block layouts, cluster sizes and resumes — never "position
    in whatever order the blocks arrived". Output ``(doc_id, row_no)``
    stays a data-sized Dataset. The rank kernel (two metadata folds +
    one range-bucket exchange) is ``rank_by_key``; see its docstring
    for the shape and the skew note."""
    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"])
    return rank_by_key(ds, "doc_id", num_buckets=num_buckets)
