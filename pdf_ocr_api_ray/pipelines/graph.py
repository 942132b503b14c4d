"""Link-graph centrality: damped PageRank over a deterministic domain
graph — the crawl-prioritization / domain-quality signal web-scale
curation pipelines compute before anything else (Common Crawl publishes
exactly this ranking over ~100M registered domains; the reference
capability it extends is the per-document quality family —
``quality_score``, ``curate_corpus`` — lifted to the *source* grain).

The graph is derived deterministically from the documents table alone
(no external data): every doc belongs to a domain
(``md5('dom|'||doc_id) % D``) and emits ``L`` out-links to domains
(``md5('lnk|'||doc_id||'|'||j) % D``) — the same little-endian md5
arithmetic every other hashed op in the engine uses, so the DuckDB twin
rebuilds the identical graph.

Scale shape (the 100M-domain regime):

- The doc-level edge list is DATA-SIZED and never leaves the cluster:
  it is built by one stateless ``map_batches`` scan over a
  ``columns=["doc_id"]`` pruned read and pinned with ``materialize()``
  so the K Jacobi iterations re-read object-store blocks, not parquet
  (the k-means read-pinning idiom).
- Per-iteration state is the (D,) int64 rank vector — METADATA-sized
  (800 MB at D=10⁸; the DSIR-style broadcast boundary). It ships via
  ``ray.put`` once per iteration and each batch folds its contribution
  partial through ``elementwise_fold`` — ZERO keyed exchanges anywhere;
  per-iteration cost is one edge scan + one (D,) ADD fold.
- Floors are taken at the DOC-EDGE grain (``r[src] // outw[src]`` per
  link), so partial sums are plain int64 additions — commutative and
  exact — making the result bit-identical across block layouts and
  parallelism levels without needing a globally-aggregated weighted
  edge table first (summing floors is layout-free; flooring a sum of
  per-layout partials would not be).

Numeric contract (all int64, no floats anywhere):

    r_0[v]   = S                                   (S = 10^9)
    c_t[v]   = Σ_{doc-edges u→v} (r_t[u] // outw[u])
    r_{t+1}[v] = (S*(100-DAMP))//100 + (DAMP * c_t[v]) // 100

Dangling domains (no docs, hence no out-links) simply leak their mass,
as in the classic formulation without a dangling-redistribution term;
the SQL twin reproduces the same choice. Headroom: total mass is ≤ D·S
≈ 2.6e11 at the default D=256, and the guard below raises long before
int64 overflow (DAMP · Σc must stay < 2^63).

Reference capability: the corpus-level curation family of
devadambruno/pdf-ocr-api (``parser/parseDocument.js`` quality filters)
generalized to source-grain ranking; algorithm: Page et al. 1999.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import elementwise_fold, read_parquet_clean

N_DOMAINS = 256
OUT_LINKS = 3
N_ITERS = 4
RANK_SCALE = 10**9
DAMP_NUM = 85
DAMP_DEN = 100


def _md5_mod(s: str, mod: int) -> int:
    """Little-endian 64-bit md5 prefix mod ``mod`` — the engine-wide
    stable hash (dedup._stable64) reduced to a bucket id; the SQL twin
    rebuilds it via oracles._md5_le64."""
    return (
        int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "little") % mod
    )


def pagerank_domains(
    sf_dir: str,
    n_domains: int = N_DOMAINS,
    out_links: int = OUT_LINKS,
    n_iters: int = N_ITERS,
):
    """Damped PageRank over the deterministic domain graph. Output one
    row per domain (all ``n_domains`` of them, ordered):
    ``(domain:int64, rank_u:int64, n_docs:int64)`` where ``rank_u`` is
    the exact-integer rank after ``n_iters`` Jacobi iterations and
    ``n_docs`` counts the domain's documents (= outw // out_links)."""
    import ray

    D, L = int(n_domains), int(out_links)
    if D <= 0 or L <= 0 or n_iters < 0:
        raise ValueError("n_domains/out_links must be positive, n_iters >= 0")
    # int64 headroom: worst-case Σ contributions is the total mass D·S
    # (asserted-guard pattern, cf. bigram_fluency's FLUENCY_SCALE bound)
    if DAMP_NUM * D * RANK_SCALE >= 2**62:
        raise OverflowError("n_domains too large for the int64 rank contract")

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def make_edges(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype("int64")
        src = np.fromiter(
            (_md5_mod(f"dom|{int(d)}", D) for d in ids),
            dtype=np.int64,
            count=len(ids),
        )
        srcs, dsts = [], []
        for j in range(L):
            srcs.append(src)
            dsts.append(
                np.fromiter(
                    (_md5_mod(f"lnk|{int(d)}|{j}", D) for d in ids),
                    dtype=np.int64,
                    count=len(ids),
                )
            )
        return pd.DataFrame(
            {"src": np.concatenate(srcs), "dst": np.concatenate(dsts)}
        )

    # pin the slim (src, dst) edge blocks in the object store once —
    # the K iterations scan blocks, not parquet
    edges = ds.map_batches(make_edges, batch_format="pandas").materialize()

    # out-weight per domain: one (D,) ADD fold (outw = L × docs-per-domain
    # since every doc emits exactly L links from its one src domain)
    outw = elementwise_fold(
        edges,
        lambda df: np.bincount(
            df["src"].to_numpy(np.int64), minlength=D
        ).astype(np.int64),
        np.add,
        np.int64,
        (D,),
    )

    base = (RANK_SCALE * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    ranks = np.full(D, RANK_SCALE, dtype=np.int64)
    for _ in range(int(n_iters)):
        ref = ray.put(ranks)
        outw_ref = ray.put(outw)

        def contrib(df: pd.DataFrame, _r=ref, _o=outw_ref) -> np.ndarray:
            r = ray.get(_r)
            o = ray.get(_o)
            s = df["src"].to_numpy(np.int64)
            d = df["dst"].to_numpy(np.int64)
            # per-EDGE floor (see module docstring): exact int64, and
            # o[s] > 0 by construction (src has at least this edge)
            per_edge = r[s] // o[s]
            acc = np.zeros(D, dtype=np.int64)
            np.add.at(acc, d, per_edge)
            return acc

        c = elementwise_fold(edges, contrib, np.add, np.int64, (D,))
        ranks = base + (DAMP_NUM * c) // DAMP_DEN

    return pa.table(
        {
            "domain": pa.array(np.arange(D, dtype=np.int64)),
            "rank_u": pa.array(ranks),
            "n_docs": pa.array(outw // L),
        }
    )


PRIORITY_GUARD = (2**63 - 1) // 10_000  # rank_u × quality_idx headroom


def crawl_priority(sf_dir: str, n_domains: int = N_DOMAINS):
    """Crawl/curation prioritization — the composition a real web
    pipeline runs: the domain-level PageRank signal joined onto every
    document and crossed with the per-document quality lattice,
    ``priority_u = rank_u[domain] · quality_idx`` (exact int64; the
    integer-rational ranking discipline). High-centrality domains
    amplify good documents; junk on strong domains still loses to the
    quality factor.

    Shape: ``pagerank_domains`` reduces to the (D,)-bounded rank table
    (metadata — the broadcastable side), which ships once via
    ``ray.put``; the per-document pass is ONE stateless scan computing
    each doc's domain (same md5 arithmetic) and quality, then a fancy-
    indexed lookup — a broadcast join, never a keyed exchange (the
    orders_per_nation small-side rule). Output
    ``(doc_id, domain, quality_idx, priority_u)`` stays a Dataset."""
    import ray

    from .text import _quality_cols

    D = int(n_domains)
    pr = pagerank_domains(sf_dir, n_domains=D)
    ranks = pr["rank_u"].to_numpy()
    if int(ranks.max()) > PRIORITY_GUARD:
        raise OverflowError("rank_u exceeds the priority product headroom")
    ranks_ref = ray.put(np.ascontiguousarray(ranks, dtype=np.int64))

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def score(df: pd.DataFrame, _r=ranks_ref) -> pd.DataFrame:
        r = ray.get(_r)
        ids = df["doc_id"].astype("int64").to_numpy()
        dom = np.fromiter(
            (_md5_mod(f"dom|{int(d)}", D) for d in ids),
            dtype=np.int64,
            count=len(ids),
        )
        _, quality = _quality_cols(df["text"].str.lower())
        q = np.rint(quality.to_numpy() * 10000.0).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": ids,
                "domain": dom,
                "quality_idx": q,
                "priority_u": r[dom] * q,
            }
        )

    return ds.map_batches(score, batch_format="pandas")
