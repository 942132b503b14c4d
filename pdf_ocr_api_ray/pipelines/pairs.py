"""Distributed exact-Jaccard verification of candidate pairs — shared
by the MinHash-LSH near-dup path and the prefix-filtered n-gram
Jaccard path.

Contract: given a factory for a per-doc hash-set Dataset
``make_sets(members_ref) -> Dataset(doc_id:int64, hashes:list<uint64>)``
and a DISTINCT candidate-pair Dataset ``cand(id_a:int64, id_b:int64)``,
return the confirmed pairs ``(id_a, id_b, jaccard)`` with exact
hash-set Jaccard ≥ threshold (rounded half-away to 4 dp, matching the
SQL oracles).

Two routings, auto-switched on candidate count:

- **broadcast** (default below ``max_broadcast_pairs``): the pair ids
  are collected once to the driver as a routing index (16 B/pair),
  ``ray.put`` once; each doc's hash set is shipped ONCE per verify
  bucket it participates in (O(k·B) exchange for a k-duplicate
  cluster, not O(k²)), and buckets verify in parallel. Lowest latency;
  driver memory is O(candidate pairs).
- **join** (above the threshold): two hash-partitioned
  ``Dataset.join``s route each side's hash set to its pair rows — the
  driver never materializes the pair list, so 10⁹+ candidates stream
  through the object store. Exchange volume is O(pairs × set size)
  (a doc's set is re-shipped per pair it appears in), the price of
  zero driver state; the broadcast path stays the low-latency default
  exactly because of that trade.

``members_ref`` (broadcast mode only) is a ``ray.put`` handle to the
set of doc ids that appear in any candidate pair — the factory can
skip hashing non-candidate docs. Join mode passes ``None`` (the inner
join itself drops non-candidates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import round_half_away

PAIR_SCHEMA = pa.schema(
    [("id_a", pa.int64()), ("id_b", pa.int64()), ("jaccard", pa.float64())]
)
SETS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("hashes", pa.list_(pa.uint64()))])

MAX_BROADCAST_PAIRS = 2_000_000
_VERIFY_BUCKETS = 64


def _empty_pairs():
    # Ray's to_pandas drops the schema on ANY empty dataset — return a
    # schema-carrying empty table so callers see uniform columns
    import ray.data as rd

    return rd.from_arrow(PAIR_SCHEMA.empty_table())


def _round4(vals: list[float]) -> pa.Array:
    return pa.array(
        round_half_away(pd.Series(vals, dtype="float64"), 4).to_numpy()
        if vals
        else np.array([], dtype="float64"),
        pa.float64(),
    )


def verify_jaccard_pairs(
    make_sets,
    cand,
    threshold: float,
    *,
    max_broadcast_pairs: int = MAX_BROADCAST_PAIRS,
    num_join_partitions: int = 64,
):
    """Exact-Jaccard verify of ``cand`` (see module docstring).

    ``cand`` must already be distinct (route through
    ``_util.distinct_pairs`` first); duplicate pair rows would emit
    duplicate outputs in join mode.
    """
    cand_m = cand.materialize()  # counted once, consumed once — no lineage re-run
    n_cand = cand_m.count()
    if n_cand == 0:
        return _empty_pairs()
    if n_cand <= max_broadcast_pairs:
        return _verify_broadcast(make_sets, cand_m, threshold)
    return _verify_join(make_sets, cand_m, threshold, num_join_partitions)


def _verify_broadcast(make_sets, cand_m, threshold: float):
    import ray

    # NO silent re-dedup here: cand must already be distinct (see
    # docstring) — repairing it only in broadcast mode would let a
    # non-distinct caller pass every small-scale test and emit
    # duplicate confirmed pairs the first time candidate volume crosses
    # into join mode. Both routings now fail alike on bad input.
    cand_pd = cand_m.to_pandas()
    pairs = cand_pd[["id_a", "id_b"]].to_numpy(np.int64)

    # routing index: doc_id → [(pair_idx, side)] — ids only, broadcast
    # once. pairs and roles ship as SEPARATE objects: fan_out needs only
    # the dict, verify_bucket only the ndarray (zero-copy from plasma) —
    # bundling them would re-unpickle the multi-MB dict in every
    # verify group that never reads it
    roles: dict[int, list[tuple[int, int]]] = {}
    for pidx, (a, b) in enumerate(pairs):
        roles.setdefault(int(a), []).append((pidx, 0))
        roles.setdefault(int(b), []).append((pidx, 1))
    pairs_ref = ray.put(pairs)
    roles_ref = ray.put(roles)
    members_ref = ray.put(set(roles))

    sets_ds = make_sets(members_ref)

    bucket_schema = pa.schema(
        [
            ("vb", pa.int32()),
            # one row per (doc, verify-bucket): the doc's hash set is
            # shipped ONCE per bucket it participates in, with its pair
            # memberships encoded alongside (pidx*2 + side)
            ("roles", pa.list_(pa.int64())),
            ("hashes", pa.list_(pa.uint64())),
        ]
    )

    # per-worker cache for the routing dict: plasma re-deserializes
    # non-numpy objects on EVERY ray.get, so a bare get inside fan_out
    # would re-unpickle the multi-MB dict once per batch. The closure
    # cell is captured in the pickled function; Ray workers deserialize
    # the batch fn once and reuse it, so the dict is resolved once per
    # worker process. (pairs_ref stays a bare get in verify_bucket — a
    # numpy ndarray IS zero-copy from plasma.)
    _roles_cache: dict = {}

    def fan_out(t: pa.Table) -> pa.Table:
        role_map = _roles_cache.get("roles")
        if role_map is None:
            role_map = _roles_cache["roles"] = ray.get(roles_ref)
        vb, roles_c, hashes_c = [], [], []
        hl = t["hashes"].to_pylist()
        for j, doc_id in enumerate(t["doc_id"].to_pylist()):
            rs = role_map.get(int(doc_id))
            if not rs:
                continue
            by_vb: dict[int, list[int]] = {}
            for pidx, side in rs:
                by_vb.setdefault(pidx % _VERIFY_BUCKETS, []).append(pidx * 2 + side)
            for b, enc in by_vb.items():
                vb.append(b)
                roles_c.append(enc)
                hashes_c.append(hl[j])
        return pa.table(
            {
                "vb": pa.array(vb, pa.int32()),
                "roles": pa.array(roles_c, pa.list_(pa.int64())),
                "hashes": pa.array(hashes_c, pa.list_(pa.uint64())),
            },
            schema=bucket_schema,
        )

    fanned = sets_ds.map_batches(fan_out, batch_format="pyarrow")

    def verify_bucket(g: pa.Table) -> pa.Table:
        all_pairs = ray.get(pairs_ref)
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
            if j >= threshold:
                ka.append(int(all_pairs[p][0]))
                kb.append(int(all_pairs[p][1]))
                jac.append(j)
        return pa.table(
            {
                "id_a": pa.array(ka, pa.int64()),
                "id_b": pa.array(kb, pa.int64()),
                "jaccard": _round4(jac),
            }
        )

    return fanned.groupby("vb").map_groups(verify_bucket, batch_format="pyarrow")


def _verify_join(make_sets, cand_m, threshold: float, num_partitions: int):
    """Join routing: pair rows meet each side's hash set in a hash
    partition — zero driver state (the 10⁹-candidate path). Hash sets
    travel as little-endian uint64 binary blobs: Arrow's hash join
    rejects list-typed non-key columns, and a blob is also the denser
    wire format (no offsets child array)."""
    from ._util import clamped_join_partitions

    num_partitions = clamped_join_partitions(num_partitions)
    # normalize block schemas before joining: cand comes out of
    # map_groups stages that pass through zero-column empty blocks
    # (Ray drops empty-block schemas), which Arrow's hash join rejects
    # intermittently; one repartition pass over the 16 B/pair rows is
    # cheap insurance even at 10⁹ candidates
    cand_m = cand_m.repartition(num_partitions)
    # materialize the hash sets ONCE: both join sides consume them, and
    # an unmaterialized lineage would re-run the corpus scan + set
    # hashing (the dominant kernel) twice — on exactly the path built
    # for extreme candidate volume. Object-store spill covers the size.
    sets_ds = make_sets(None).materialize()

    def as_side(side: str):
        def pack(t: pa.Table) -> pa.Table:
            blobs = [
                np.ascontiguousarray(np.asarray(h, dtype=np.uint64)).tobytes()
                for h in t["hashes"].to_pylist()
            ]
            return pa.table(
                {
                    f"id_{side}": t["doc_id"],
                    f"blob_{side}": pa.array(blobs, pa.binary()),
                }
            )

        return sets_ds.map_batches(pack, batch_format="pyarrow")

    j1 = cand_m.join(as_side("a"), "inner", num_partitions, on=("id_a",))
    j2 = j1.join(as_side("b"), "inner", num_partitions, on=("id_b",))

    def jac_rows(t: pa.Table) -> pa.Table:
        ba = t["blob_a"].to_pylist()
        bb = t["blob_b"].to_pylist()
        ids_a = t["id_a"].to_pylist()
        ids_b = t["id_b"].to_pylist()
        ka, kb, jac = [], [], []
        for j in range(len(ba)):
            sa = np.frombuffer(ba[j], dtype=np.uint64)
            sb = np.frombuffer(bb[j], dtype=np.uint64)
            if sa.size == 0 or sb.size == 0:
                continue
            inter = np.intersect1d(sa, sb, assume_unique=True).size
            union = sa.size + sb.size - inter
            v = inter / union
            if v >= threshold:
                ka.append(int(ids_a[j]))
                kb.append(int(ids_b[j]))
                jac.append(v)
        return pa.table(
            {
                "id_a": pa.array(ka, pa.int64()),
                "id_b": pa.array(kb, pa.int64()),
                "jaccard": _round4(jac),
            }
        )

    return j2.map_batches(jac_rows, batch_format="pyarrow")
