"""Span-surgery operators — the Adobe PDF-Services sample-family
analogues (SURVEY.md §2.3) re-expressed as list-kernel transforms over
the interleaved spans table.

Reference mapping (all under /root/reference/src):
- splitpdf/*          → ``split_chunks``   (doc → one row per chunk)
- combinepdf/*        → ``combine_docs``   (ordered concat by group key ≙ O8)
- deletepages/*       → ``delete_chunks``  (drop a chunk range, re-offset)
- reorderpages/*      → ``reorder_chunks`` (permute chunk order, re-offset)
- rotatepages/*       → ``rotate_media``   (per-span media transform tag)
- pdfwatermark/*      → ``watermark``      (broadcast small-side merge into
                                            every document ≙ watermark asset)
- pdfproperties/*     → ``span_properties``(per-doc metadata projection)

Every transform is a ``map_batches`` over the spans list column (explode
to flat span rows only when fan-out is the point); documents never
shuffle except ``combine_docs``'s one groupby. Each op's semantics are
pinned by a pure-python per-doc oracle in tests/test_spanops.py.
"""

from __future__ import annotations

import pyarrow as pa

from ._util import read_parquet_clean

# module-level (not lazy inside the batch UDF): layout_elements_batch
# runs on workers, where a function-body relative import defeats the
# package's pickle-by-value shipping when the driver imported
# __ray_entry__ from outside the repo (same any-cwd class as the
# actor-stage clients hoist)
from ..functions.ocr import CHUNK_STRIDE, MEDIA_KINDS, TABLE_KINDS
from ..schemas import INPUT_SCHEMA


def _spans_corpus(sf_dir: str):
    """The deterministic spans corpus derived from the sf documents."""
    import ray.data as rd

    from ..sources.corpus import documents_batch_to_spans

    docs = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return docs.map_batches(documents_batch_to_spans, batch_format="pyarrow")


# ---------- pure per-doc kernels (shared by stage + test oracle) ----------


def split_doc(doc_id: str, spans: list[dict]) -> list[dict]:
    """doc → one output row per chunk, chunk re-based to 0 (splitpdf)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    rows = []
    for new_idx, c in enumerate(sorted(by_chunk)):
        part = sorted(by_chunk[c], key=lambda s: int(s["offset"]))
        rebased = [
            {**s, "offset": (int(s["offset"]) % CHUNK_STRIDE)} for s in part
        ]
        rows.append({"doc_id": f"{doc_id}#c{new_idx}", "spans": rebased})
    return rows or [{"doc_id": f"{doc_id}#c0", "spans": []}]


def delete_chunks_doc(spans: list[dict], lo: int, hi: int) -> list[dict]:
    """Drop chunks in [lo, hi), close the gap (deletepages semantics —
    remaining pages renumber)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    keep = [c for c in sorted(by_chunk) if not (lo <= c < hi)]
    out = []
    for new_idx, c in enumerate(keep):
        for s in sorted(by_chunk[c], key=lambda s: int(s["offset"])):
            out.append({**s, "offset": new_idx * CHUNK_STRIDE + int(s["offset"]) % CHUNK_STRIDE})
    return out


def reorder_chunks_doc(spans: list[dict]) -> list[dict]:
    """Reverse the chunk order (reorderpages with a reversed range)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    out = []
    for new_idx, c in enumerate(sorted(by_chunk, reverse=True)):
        for s in sorted(by_chunk[c], key=lambda s: int(s["offset"])):
            out.append({**s, "offset": new_idx * CHUNK_STRIDE + int(s["offset"]) % CHUNK_STRIDE})
    return out


def rotate_media_doc(spans: list[dict], angle: int = 90) -> list[dict]:
    """Tag every media span with a rotation transform (rotatepages is a
    per-page byte map; by-reference payloads carry the op in the ref)."""
    return [
        {**s, "media_ref": f"{s['media_ref']}#rot{angle}"}
        if s.get("kind") == "page_image" and s.get("media_ref")
        else s
        for s in spans or []
    ]


def watermark_doc(spans: list[dict], wm_ref: str) -> list[dict]:
    """Insert the (broadcast) watermark media span at the start of every
    chunk (pdfwatermark: overlay asset applied to every page)."""
    by_chunk: dict[int, list[dict]] = {}
    for s in spans or []:
        by_chunk.setdefault(int(s["offset"]) // CHUNK_STRIDE, []).append(s)
    out = []
    for c in sorted(by_chunk):
        base = c * CHUNK_STRIDE
        out.append({"kind": "page_image", "text": "", "media_ref": wm_ref, "offset": base})
        for s in sorted(by_chunk[c], key=lambda s: int(s["offset"])):
            out.append({**s, "offset": int(s["offset"]) + 1})
    return out


# ---------- vectorized flat-span machinery (shared by the stages) ----------
#
# Every surgery stage works on the flattened span table of a batch:
# one lexsort by (doc, chunk, offset), dense chunk ranks from run
# boundaries, offset arithmetic in numpy, and ONE ListArray rebuild —
# no Python per row/span (the to_pylist() rebuilds the round-1 version
# used were the measured hot spot; span_properties proved this pattern).


def _flat_sorted(t: "pa.Table"):
    """Flatten + sort a batch's spans by (doc, chunk, offset).

    Returns (flat_sorted, par_s, chunk_s, row_s) — struct array plus
    int64 numpy arrays (parent row, chunk index, row-within-chunk)."""
    import numpy as np
    import pyarrow.compute as pc

    spans = t.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False).astype(np.int64)
    off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = off // CHUNK_STRIDE
    row = off % CHUNK_STRIDE
    order = np.lexsort((off, chunk, par))
    return flat.take(pa.array(order)), par[order], chunk[order], row[order]


def _chunk_ranks(par_s, chunk_s):
    """Per-span dense chunk rank within its doc + group metadata.

    Returns (rank_span, gid_span, group_par, rank_group, npg_group):
    the first two are per-SPAN, the last three per-GROUP (one entry per
    (doc, chunk) run, aligned with ``group_par``); ``npg_group[g]`` is
    the chunk count of group g's parent doc — NOT indexed by parent id
    (map per-span via ``npg_group[gid_span]``)."""
    import numpy as np

    n = len(par_s)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z, z, z
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (par_s[1:] != par_s[:-1]) | (chunk_s[1:] != chunk_s[:-1])
    gid = np.cumsum(change) - 1
    group_par = par_s[change]
    pchange = np.empty(len(group_par), dtype=bool)
    pchange[0] = True
    pchange[1:] = group_par[1:] != group_par[:-1]
    gidx = np.arange(len(group_par))
    first = np.maximum.accumulate(np.where(pchange, gidx, 0))
    rank_group = gidx - first
    starts = np.flatnonzero(pchange)
    npg = np.diff(np.append(starts, len(group_par)))
    n_groups_group = np.repeat(npg, npg)  # per group: its parent's chunk count
    return rank_group[gid], gid, group_par, rank_group, n_groups_group


def _rebuild(doc_ids, n_docs: int, par_s, flat_s, new_off) -> "pa.Table":
    """Reassemble (doc_id, spans) rows from kept+sorted flat spans."""
    import numpy as np

    counts = np.bincount(par_s, minlength=n_docs)
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    struct = pa.StructArray.from_arrays(
        [
            flat_s.field("kind"),
            flat_s.field("text"),
            flat_s.field("media_ref"),
            pa.array(new_off.astype("int32"), pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()), struct)
    return pa.table({"doc_id": doc_ids, "spans": spans}, schema=INPUT_SCHEMA)


# ---------- Ray stages / queries ----------


def split_batch(t: pa.Table) -> pa.Table:
    """Vectorized splitpdf batch transform (see split_chunks)."""
    import numpy as np
    import pyarrow.compute as pc

    flat_s, par_s, chunk_s, row_s = _flat_sorted(t)
    rank_span, gid, group_par, rank_group, _ = _chunk_ranks(par_s, chunk_s)
    n = len(par_s)
    # one list per (doc, chunk) group; groups are contiguous runs
    if n:
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
    else:
        starts = np.zeros(0, dtype=np.int64)
    list_offs = np.append(starts, n)
    struct = pa.StructArray.from_arrays(
        [
            flat_s.field("kind"),
            flat_s.field("text"),
            flat_s.field("media_ref"),
            pa.array(row_s.astype("int32"), pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    spans = pa.ListArray.from_arrays(
        pa.array(list_offs, pa.int64()).cast(pa.int32()), struct
    )
    base_ids = pc.take(t["doc_id"], pa.array(group_par))
    suffix = pa.array([f"#c{r}" for r in rank_group], pa.string())
    doc_ids = pc.binary_join_element_wise(base_ids, suffix, "")
    out = pa.table({"doc_id": doc_ids, "spans": spans}, schema=INPUT_SCHEMA)

    # docs with zero spans → one empty '#c0' row each (F15 contract)
    present = np.zeros(t.num_rows, dtype=bool)
    present[group_par] = True
    missing = np.flatnonzero(~present)
    if len(missing):
        empty = pa.table(
            {
                "doc_id": pc.binary_join_element_wise(
                    pc.take(t["doc_id"], pa.array(missing)),
                    pa.array(["#c0"] * len(missing)),
                    "",
                ),
                "spans": pa.ListArray.from_arrays(
                    pa.array(np.zeros(len(missing) + 1, dtype=np.int32)),
                    struct.slice(0, 0),
                ),
            },
            schema=INPUT_SCHEMA,
        )
        out = pa.concat_tables([out, empty])
    return out


def split_chunks(sf_dir: str):
    """doc → one output row per chunk, chunk re-based to 0 (splitpdf)."""
    ds = _spans_corpus(sf_dir)
    out = ds.map_batches(split_batch, batch_format="pyarrow")
    return _project_counts(out)


def combine_docs(sf_dir: str, group_size: int = 10, num_buckets: int = 256):
    """Ordered concat of documents into groups (combinepdf): group key =
    doc index // group_size, chunk indices re-based so member k's chunks
    follow member k-1's. ONE groupby over hash buckets of the group key
    (many groups merged per Ray group, vectorized — not one Python call
    per output doc); order key = doc_id within group."""
    import numpy as np
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        # doc-id suffix is the numeric index (corpus emits doc-%08d; the
        # slice tolerates longer suffixes but requires the 'doc-' prefix)
        nums = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64())
        gk = pc.cast(pc.divide(nums, group_size), "int64")
        t = t.append_column("group_key", gk)
        return t.append_column(
            "gb", pa.array((gk.to_numpy(zero_copy_only=False) % num_buckets).astype("int32"))
        )

    def merge_bucket(t: pa.Table) -> pa.Table:
        si = pc.sort_indices(
            t, sort_keys=[("group_key", "ascending"), ("doc_id", "ascending")]
        )
        t = t.take(si)
        gk = t["group_key"].to_numpy(zero_copy_only=False)
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False).astype(np.int64)
        off = flat.field("offset").to_numpy(zero_copy_only=False).astype(np.int64)
        chunk = off // CHUNK_STRIDE
        row = off % CHUNK_STRIDE

        # chunk_base per member doc: exclusive running (max_chunk+1)
        # within its group
        mx = np.full(t.num_rows, -1, dtype=np.int64)
        np.maximum.at(mx, par, chunk)
        sizes = mx + 1
        excl = np.r_[0, np.cumsum(sizes)[:-1]]
        grp_change = np.r_[True, gk[1:] != gk[:-1]] if len(gk) else np.zeros(0, bool)
        group_start_excl = np.maximum.accumulate(np.where(grp_change, excl, 0))
        base = excl - group_start_excl
        new_off = (base[par] + chunk) * CHUNK_STRIDE + row

        # one output list per group_key (lists contiguous: par sorted)
        grp_idx_doc = np.cumsum(grp_change) - 1 if len(gk) else np.zeros(0, np.int64)
        n_groups = int(grp_idx_doc[-1]) + 1 if len(gk) else 0
        counts = np.bincount(grp_idx_doc[par], minlength=n_groups)
        offs = np.zeros(n_groups + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        struct = pa.StructArray.from_arrays(
            [
                flat.field("kind"),
                flat.field("text"),
                flat.field("media_ref"),
                pa.array(new_off.astype("int32"), pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        out_spans = pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()), struct)
        gk_out = gk[np.flatnonzero(grp_change)] if len(gk) else gk
        doc_ids = pa.array([f"group-{int(g):06d}" for g in gk_out], pa.string())
        return pa.table({"doc_id": doc_ids, "spans": out_spans}, schema=INPUT_SCHEMA)

    out = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
    return _project_counts(out)


def _pair_merge(sf_dir: str, mode: str, num_buckets: int = 256):
    """Shared engine for insertpages/replacepages: documents pair up
    (doc 2k = base, doc 2k+1 = insert source), chunks re-mapped by the
    mode's rank formula:

    - insert  (src/insertpages/insert-pdf-pages.js:63-75): the whole
      partner document is inserted after the base's first chunk —
      base rank 0 → 0, partner rank r → 1+r, base rank r ≥ 1 → 1+n_p+r-1.
    - replace (src/replacepages/replace-pdf-pages.js:64-75): base
      chunks [1, 3) are replaced by the partner's FIRST chunk —
      base 0 → 0, partner 0 → 1, base r ≥ 3 → r-1; the rest drop.

    One bucketed exchange; all rank arithmetic vectorized on the flat
    span table."""
    import numpy as np
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def add_key(t: pa.Table) -> pa.Table:
        nums = pc.cast(pc.utf8_slice_codeunits(t["doc_id"], 4, 99), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        t = t.append_column("pair", pa.array(nums // 2))
        t = t.append_column("role", pa.array((nums % 2).astype("int8")))
        return t.append_column("gb", pa.array(((nums // 2) % num_buckets).astype("int32")))

    def merge_bucket(t: pa.Table) -> pa.Table:
        si = pc.sort_indices(t, sort_keys=[("pair", "ascending"), ("role", "ascending")])
        t = t.take(si)
        pair = t["pair"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat_s, par_s, chunk_s, row_s = _flat_sorted(t)
        rank_span, gid, group_par, rank_group, npg_group = _chunk_ranks(par_s, chunk_s)

        nchunks_doc = np.zeros(t.num_rows, dtype=np.int64)
        if len(group_par):
            nchunks_doc[group_par] = npg_group
        idx1 = np.flatnonzero(role == 1)
        pair1 = pair[idx1]  # sorted (pair asc, role asc → unique per pair)
        np1_of = nchunks_doc[idx1]
        pair_span = pair[par_s]
        role_span = role[par_s]
        if len(pair1):
            pos = np.searchsorted(pair1, pair_span)
            pos_c = np.clip(pos, 0, len(pair1) - 1)
            np1_span = np.where(pair1[pos_c] == pair_span, np1_of[pos_c], 0)
        else:  # no role-1 docs in this bucket (odd tail pair)
            np1_span = np.zeros(len(pair_span), dtype=np.int64)

        r = rank_span
        if mode == "insert":
            keep = np.ones(len(par_s), dtype=bool)
            new_chunk = np.where(
                role_span == 1, 1 + r, np.where(r == 0, 0, 1 + np1_span + r - 1)
            )
        else:  # replace
            keep = np.where(role_span == 0, (r == 0) | (r >= 3), r == 0)
            new_chunk = np.where(role_span == 1, 1, np.where(r == 0, 0, r - 1))

        flat_k = flat_s.filter(pa.array(keep))
        par_k = par_s[keep]
        new_off = new_chunk[keep] * CHUNK_STRIDE + row_s[keep]

        # one output doc per pair, named after the base (role-0) doc
        upairs, first_of_pair = np.unique(pair, return_index=True)
        # role-0 row index per pair (role asc within pair → first row)
        pair_idx_span = np.searchsorted(upairs, pair_span[keep])
        counts = np.bincount(pair_idx_span, minlength=len(upairs))
        offs = np.zeros(len(upairs) + 1, dtype=np.int64)
        np.cumsum(counts, out=offs[1:])
        struct = pa.StructArray.from_arrays(
            [
                flat_k.field("kind"),
                flat_k.field("text"),
                flat_k.field("media_ref"),
                pa.array(new_off.astype("int32"), pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        out_spans = pa.ListArray.from_arrays(pa.array(offs, pa.int64()).cast(pa.int32()), struct)
        doc_ids = pc.take(t["doc_id"], pa.array(first_of_pair))
        return pa.table({"doc_id": doc_ids, "spans": out_spans}, schema=INPUT_SCHEMA)

    out = (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(merge_bucket, batch_format="pyarrow")
    )
    return _project_counts(out)


def insert_pages(sf_dir: str):
    """insertpages: partner document spliced in after the base's first
    chunk (see _pair_merge)."""
    return _pair_merge(sf_dir, "insert")


def replace_pages(sf_dir: str):
    """replacepages: base chunks [1,3) replaced by the partner's first
    chunk (see _pair_merge)."""
    return _pair_merge(sf_dir, "replace")


def delete_batch(t: pa.Table, lo: int = 1, hi: int = 3) -> pa.Table:
    """Vectorized deletepages batch transform."""
    flat_s, par_s, chunk_s, row_s = _flat_sorted(t)
    keep = ~((chunk_s >= lo) & (chunk_s < hi))
    flat_k = flat_s.filter(pa.array(keep))
    par_k, chunk_k, row_k = par_s[keep], chunk_s[keep], row_s[keep]
    rank_span, *_ = _chunk_ranks(par_k, chunk_k)
    new_off = rank_span * CHUNK_STRIDE + row_k
    return _rebuild(t["doc_id"], t.num_rows, par_k, flat_k, new_off)


def delete_chunks(sf_dir: str, lo: int = 1, hi: int = 3):
    """Drop chunks in [lo, hi), close the gap (deletepages)."""
    import functools

    ds = _spans_corpus(sf_dir)
    return _project_counts(
        ds.map_batches(functools.partial(delete_batch, lo=lo, hi=hi), batch_format="pyarrow")
    )


def reorder_batch(t: pa.Table) -> pa.Table:
    """Vectorized reorderpages batch transform (reverse chunk order)."""
    flat_s, par_s, chunk_s, row_s = _flat_sorted(t)
    rank_span, gid, _, rank_group, npg_group = _chunk_ranks(par_s, chunk_s)
    rev_group = (npg_group - 1) - rank_group if len(rank_group) else rank_group
    new_off = (rev_group[gid] if len(par_s) else rank_span) * CHUNK_STRIDE + row_s
    return _rebuild(t["doc_id"], t.num_rows, par_s, flat_s, new_off)


def reorder_chunks(sf_dir: str):
    """Reverse the chunk order (reorderpages with a reversed range)."""
    ds = _spans_corpus(sf_dir)
    return _project_counts(ds.map_batches(reorder_batch, batch_format="pyarrow"))


def watermark_batch(t: pa.Table, wm_ref: str) -> pa.Table:
    """Vectorized pdfwatermark batch transform: watermark rows are
    concatenated to the flat span table with row = -1 so the
    (doc, chunk, row) lexsort interleaves them at each chunk head;
    new offset = chunk·STRIDE + row + 1 for everyone."""
    import numpy as np

    flat_s, par_s, chunk_s, row_s = _flat_sorted(t)
    rank_span, gid, group_par, rank_group, _ = _chunk_ranks(par_s, chunk_s)
    n_groups = len(group_par)
    if n_groups:
        # chunk index per group = chunk_s at each group start
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        chunk_group = chunk_s[starts]
        wm_struct = pa.StructArray.from_arrays(
            [
                pa.array(["page_image"] * n_groups, pa.string()),
                pa.array([""] * n_groups, pa.string()),
                pa.array([wm_ref] * n_groups, pa.string()),
                pa.array(np.zeros(n_groups, dtype="int32"), pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        flat_all = pa.concat_arrays([flat_s, wm_struct])
        par_all = np.concatenate([par_s, group_par])
        chunk_all = np.concatenate([chunk_s, chunk_group])
        row_all = np.concatenate([row_s, np.full(n_groups, -1, dtype=np.int64)])
        order = np.lexsort((row_all, chunk_all, par_all))
        flat_all = flat_all.take(pa.array(order))
        par_all = par_all[order]
        new_off = chunk_all[order] * CHUNK_STRIDE + row_all[order] + 1
    else:
        flat_all, par_all, new_off = flat_s, par_s, row_s
    return _rebuild(t["doc_id"], t.num_rows, par_all, flat_all, new_off)


def watermark(sf_dir: str):
    """Broadcast-small-side merge: one watermark media span inserted at
    the head of every chunk (pdfwatermark; small side in the closure)."""
    import functools

    ds = _spans_corpus(sf_dir)
    return _project_counts(
        ds.map_batches(
            functools.partial(watermark_batch, wm_ref="mem://assets/watermark-draft"),
            batch_format="pyarrow",
        )
    )


def rotate_pages(sf_dir: str, angle: int = 90):
    """rotatepages as a first-class query: every media span's payload
    reference is tagged with the rotation transform (by-reference byte
    op, like the reference's per-page rotate); text spans untouched.
    Fully vectorized (no reorder → list structure reused as-is).
    Projection: per-doc span/rotated-media counts."""
    import numpy as np
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def fn(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        is_media = pc.and_(
            pc.equal(flat.field("kind"), pa.scalar("page_image")),
            pc.not_equal(flat.field("media_ref"), pa.scalar("")),
        )
        tagged = pc.binary_join_element_wise(
            flat.field("media_ref"), pa.scalar(f"#rot{angle}"), ""
        )
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n_rot = np.zeros(t.num_rows, dtype="int64")
        np.add.at(n_rot, par, is_media.to_numpy(zero_copy_only=False).astype("int64"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pc.cast(pc.list_value_length(spans), pa.int64()),
                "n_media_rotated": pa.array(n_rot),
                # the tagged refs feed the downstream byte stage; the
                # projection keeps the query SQL-checkable
                "rot_ref_len": pa.array(
                    np.bincount(
                        par,
                        weights=pc.utf8_length(
                            pc.if_else(is_media, tagged, flat.field("media_ref"))
                        ).to_numpy(zero_copy_only=False),
                        minlength=t.num_rows,
                    ).astype("int64")
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def span_properties(sf_dir: str):
    """Per-doc metadata projection (pdfproperties): span/chunk/media
    counts and text size, computed with Arrow list kernels (no Python
    per row)."""
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def props(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        n = t.num_rows
        import numpy as np

        par = parents.to_numpy(zero_copy_only=False)
        is_media = pc.equal(flat.field("kind"), pa.scalar("page_image")).to_numpy(
            zero_copy_only=False
        )
        text_len = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False)
        chunk = (flat.field("offset").to_numpy(zero_copy_only=False) // CHUNK_STRIDE).astype(
            "int64"
        )
        n_media = np.zeros(n, dtype="int64")
        np.add.at(n_media, par, is_media.astype("int64"))
        total_text = np.zeros(n, dtype="int64")
        np.add.at(total_text, par, text_len)
        n_chunks = np.zeros(n, dtype="int64")
        if len(par):
            order = np.lexsort((chunk, par))
            ps, cs = par[order], chunk[order]
            newgrp = np.ones(len(ps), dtype=bool)
            newgrp[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
            np.add.at(n_chunks, ps[newgrp], 1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pc.cast(pc.list_value_length(spans), pa.int64()),
                "n_chunks": pa.array(n_chunks),
                "n_media": pa.array(n_media),
                "total_text_len": pa.array(total_text),
            }
        )

    return ds.map_batches(props, batch_format="pyarrow")


ELEMENTS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("path", pa.string()),
        ("page", pa.int64()),
        ("num_rows", pa.int64()),
        ("num_cols", pa.int64()),
    ]
)


def layout_elements_batch(t: pa.Table) -> pa.Table:
    # vectorized flattened-span path (same kernels family as
    # _project_counts) — semantics identical to the sequential
    # functions.ocr.spans_to_document + layout.extract_elements
    # builders, which remain the library/oracle reference:
    #   - a table span starts a NEW table iff the previous span in
    #     its chunk is not a table span, or it is a header row
    #     immediately following a body row (equivalent to the
    #     builder's "header while current table has body" rule:
    #     after any body row the very next header always splits);
    #   - the paragraph block ('//Document/Sect/P') counts one line
    #     per text/table span; suppressed only when the chunk's
    #     whole text buffer is empty (no lines, or a single empty
    #     line — ''.join semantics);
    #   - one Figure row per media span.
    import numpy as np
    import pyarrow.compute as pc

    spans = t.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = pc.list_flatten(spans)
    if len(flat) == 0:
        return ELEMENTS_SCHEMA.empty_table()
    par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False).astype(np.int64)

    kind = pc.fill_null(flat.field("kind"), "")
    is_hdr = pc.equal(kind, "table_header").to_numpy(zero_copy_only=False)
    is_cell = pc.equal(kind, "table_cell").to_numpy(zero_copy_only=False)
    is_media = pc.is_in(
        kind, value_set=pa.array(list(MEDIA_KINDS), pa.string())
    ).to_numpy(zero_copy_only=False)
    is_tab = is_hdr | is_cell
    assert set(TABLE_KINDS) == {"table_header", "table_cell"}
    is_line = ~is_media  # table + text(/unknown) spans each emit a line
    text = pc.fill_null(flat.field("text"), "")
    text_empty = pc.equal(pc.utf8_length(text), 0).to_numpy(zero_copy_only=False)
    # a table row string is ' '.join(text.split('\t')) — same length
    # as the raw text, so a row line is empty iff its text is empty
    n_cols_row = (
        pc.add(pc.count_substring(text, "\t"), 1).to_numpy(zero_copy_only=False)
    )
    off = pc.fill_null(flat.field("offset"), 0).to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = off // CHUNK_STRIDE

    # chunk-major, offset-ascending scan order (stable for ties —
    # matches the sequential builder's list order)
    order = np.lexsort((off, chunk, par))
    par, chunk, off = par[order], chunk[order], off[order]
    is_hdr, is_cell, is_tab = is_hdr[order], is_cell[order], is_tab[order]
    is_media, is_line = is_media[order], is_line[order]
    text_empty, n_cols_row = text_empty[order], n_cols_row[order]

    new_group = np.ones(len(par), dtype=bool)
    new_group[1:] = (par[1:] != par[:-1]) | (chunk[1:] != chunk[:-1])
    gid = np.cumsum(new_group) - 1
    n_groups = int(gid[-1]) + 1
    g_par = par[new_group]
    g_chunk = chunk[new_group]

    prev_is_tab = np.zeros(len(par), dtype=bool)
    prev_is_tab[1:] = is_tab[:-1]
    prev_is_tab[new_group] = False
    prev_is_cell = np.zeros(len(par), dtype=bool)
    prev_is_cell[1:] = is_cell[:-1]
    prev_is_cell[new_group] = False

    starts = is_tab & (~prev_is_tab | (is_hdr & prev_is_cell))
    tid = np.cumsum(starts) - 1  # table id at every position
    n_tables = int(starts.sum())
    tbl_rows = np.zeros(n_tables, dtype=np.int64)
    np.add.at(tbl_rows, tid[is_cell], 1)
    tbl_cols = np.zeros(n_tables, dtype=np.int64)
    np.maximum.at(tbl_cols, tid[is_tab], n_cols_row[is_tab])
    tbl_par = par[starts]
    tbl_chunk = chunk[starts]

    n_lines = np.zeros(n_groups, dtype=np.int64)
    np.add.at(n_lines, gid[is_line], 1)
    n_nonempty = np.zeros(n_groups, dtype=np.int64)
    np.add.at(n_nonempty, gid[is_line & ~text_empty], 1)
    p_emit = (n_lines >= 2) | ((n_lines == 1) & (n_nonempty >= 1))
    n_fig = np.zeros(n_groups, dtype=np.int64)
    np.add.at(n_fig, gid[is_media], 1)

    fig_groups = np.repeat(np.arange(n_groups), n_fig)
    out_par = np.concatenate([tbl_par, g_par[p_emit], g_par[fig_groups]])
    out_page = np.concatenate([tbl_chunk, g_chunk[p_emit], g_chunk[fig_groups]])
    out_rows = np.concatenate(
        [tbl_rows, n_lines[p_emit], np.zeros(fig_groups.size, dtype=np.int64)]
    )
    out_cols = np.concatenate(
        [tbl_cols, np.zeros(int(p_emit.sum()) + fig_groups.size, dtype=np.int64)]
    )
    out_path = np.concatenate(
        [
            np.full(n_tables, "//Document/Sect/Table", dtype=object),
            np.full(int(p_emit.sum()), "//Document/Sect/P", dtype=object),
            np.full(fig_groups.size, "//Document/Sect/Figure", dtype=object),
        ]
    )
    return pa.table(
        {
            "doc_id": pc.take(t["doc_id"], pa.array(out_par, pa.int64())),
            "path": pa.array(out_path, pa.string()),
            "page": pa.array(out_page, pa.int64()),
            "num_rows": pa.array(out_rows, pa.int64()),
            "num_cols": pa.array(out_cols, pa.int64()),
        },
        schema=ELEMENTS_SCHEMA,
    )


def extract_layout(sf_dir: str):
    """Structured layout extraction (extractpdf family + the reference's
    lib/extractLayout.js): one Adobe-Extract-style element row per
    table/paragraph-block/figure per chunk — the vectorized
    ``layout_elements_batch`` kernel over the spans corpus
    (tests/test_spanops_property.py pins it against the sequential
    functions.ocr/layout builders on adversarial structures)."""
    return _spans_corpus(sf_dir).map_batches(
        layout_elements_batch, batch_format="pyarrow"
    )


def _project_counts(ds):
    """Compact SQL-checkable result: per-doc span count + offset checksum
    (stable fingerprint of the surgery result)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        import numpy as np

        flat = pc.list_flatten(spans)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        off = flat.field("offset").to_numpy(zero_copy_only=False).astype("int64")
        checksum = np.zeros(t.num_rows, dtype="int64")
        np.add.at(checksum, par, off * 31 % 1_000_003)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_spans": pc.cast(pc.list_value_length(spans), pa.int64()),
                "offset_checksum": pa.array(checksum),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def autotag_report(sf_dir: str, page_start: int = 0, page_end: int = 2):
    """autotag + pdfaccessibilitychecker analogue (reference
    src/autotag/autotag-pdf-with-options.js:51-54 — AutotagPDFParams
    {generateReport: true, shiftHeadings: true} — and
    src/pdfaccessibilitychecker/pdf-accessibility-checker-with-options.js:50-53
    — PDFAccessibilityCheckerParams {pageStart, pageEnd}): one per-doc
    REPORT row over the spans corpus, fully vectorized (Arrow list
    kernels + np.add.at scatter — no Python per span):

    - tagging counts (the generated report): n_p = non-empty text
      spans tagged <P>, n_tables = chunks carrying a table header,
      n_figures = page_image spans;
    - shiftHeadings: headings are the non-empty text spans at chunk
      row 0 (the document/section title lines) — all shift one level,
      n_h_shifted counts them;
    - accessibility check over the [page_start, page_end] chunk range
      (the checker's pageStart/pageEnd): n_pages_checked distinct
      chunks in range, n_figs_no_alt = figures with no alt text (empty
      ``text``) in range, passed = no violations. The corpus's media
      branch plants alt-less images in chunk 0, so ``passed`` is
      non-degenerate.
    """
    import numpy as np
    import pyarrow.compute as pc

    ds = _spans_corpus(sf_dir)

    def report(t: pa.Table) -> pa.Table:
        spans = t.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = pc.list_flatten(spans)
        par = pc.list_parent_indices(spans).to_numpy(zero_copy_only=False)
        n = t.num_rows
        kind = flat.field("kind").to_numpy(zero_copy_only=False)
        text_len = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False)
        off = flat.field("offset").to_numpy(zero_copy_only=False)
        chunk = (off // CHUNK_STRIDE).astype("int64")
        row = (off % CHUNK_STRIDE).astype("int64")

        is_text = kind == "text"
        is_fig = kind == "page_image"
        nonempty = text_len > 0
        in_range = (chunk >= page_start) & (chunk <= page_end)

        def scatter(mask) -> np.ndarray:
            out = np.zeros(n, dtype="int64")
            np.add.at(out, par[mask], 1)
            return out

        def distinct_chunks(mask) -> np.ndarray:
            out = np.zeros(n, dtype="int64")
            p, c = par[mask], chunk[mask]
            if len(p):
                order = np.lexsort((c, p))
                ps, cs = p[order], c[order]
                new = np.ones(len(ps), dtype=bool)
                new[1:] = (ps[1:] != ps[:-1]) | (cs[1:] != cs[:-1])
                np.add.at(out, ps[new], 1)
            return out

        n_figs_no_alt = scatter(is_fig & ~nonempty & in_range)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_p": pa.array(scatter(is_text & nonempty)),
                "n_tables": pa.array(distinct_chunks(kind == "table_header")),
                "n_figures": pa.array(scatter(is_fig)),
                "n_h_shifted": pa.array(scatter(is_text & nonempty & (row == 0))),
                "n_pages_checked": pa.array(distinct_chunks(in_range)),
                "n_figs_no_alt": pa.array(n_figs_no_alt),
                "passed": pa.array(n_figs_no_alt == 0),
            }
        )

    return ds.map_batches(report, batch_format="pyarrow")
