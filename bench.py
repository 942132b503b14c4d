#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline extraction pipeline plus a
representative query set over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(num_cpus=$RAY_GRAFT_CPUS)``
(default 32) and prints ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling``: runs the headline pipeline twice in fresh processes
(num_cpus=8 then 32) on the same input and reports both throughputs and
the scaling efficiency = throughput(4N) / (4 × throughput(N)) — the
sandbox stand-in for the N vs 4N cluster-size rule (BASELINE.md).

The extraction corpus is the deterministic spans conversion of the
scale factor's ``documents`` table, replicated ``$GRAFT_BENCH_REPLICATE``
times (default 8) with distinct doc_ids to give the pipeline a
meaningful document count; it is generated once (untimed) and cached
under /tmp keyed by (sf_dir, replication).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_BENCH_REPLICATE", "8"))


def _corpus_path() -> str:
    key = f"{SF_DIR.strip('/').replace('/', '_')}_x{REPLICATE}"
    return f"/tmp/graft_bench_corpus_{key}_v3"  # v3: md5-draw corpus


def build_corpus() -> tuple[str, int, int]:
    """Deterministic spans corpus (untimed input prep). Returns
    (path, n_docs, n_chunks)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.functions.ocr import CHUNK_STRIDE
    from pdf_ocr_api_ray.sources.corpus import document_to_spans

    path = _corpus_path()
    meta_path = path + ".meta.json"
    if os.path.exists(path) and os.path.exists(meta_path):
        meta = json.load(open(meta_path))
        return path, meta["n_docs"], meta["n_chunks"]

    docs_t = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    doc_ids = docs_t.column("doc_id").to_pylist()
    texts = docs_t.column("text").to_pylist()

    from pdf_ocr_api_ray.schemas import INPUT_SCHEMA

    rows = []
    n_chunks = 0
    for r in range(REPLICATE):
        for doc_id, text in zip(doc_ids, texts):
            vid = doc_id + r * 10_000_000
            spans = document_to_spans(vid, text)
            if spans:
                n_chunks += len({s["offset"] // CHUNK_STRIDE for s in spans})
            else:
                n_chunks += 1
            rows.append({"doc_id": f"doc-{vid:09d}", "spans": spans})
    table = pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)
    # a directory of files, not one file: the read must parallelize
    # (a single parquet file is one serial read task)
    os.makedirs(path, exist_ok=True)
    n_files = 64
    per = (table.num_rows + n_files - 1) // n_files
    for i in range(n_files):
        chunk = table.slice(i * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"part-{i:04d}.parquet"))
    json.dump({"n_docs": len(rows), "n_chunks": n_chunks}, open(meta_path, "w"))
    return path, len(rows), n_chunks


def run_bench() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdf_ocr_api_ray.pipelines import (
        curation,
        dedup,
        events,
        htmlx,
        prep,
        relational,
        sampling,
        semdedup,
        similarity,
        text,
    )
    from pdf_ocr_api_ray.pipelines import bpe, dsir, model
    from pdf_ocr_api_ray.pipelines import pca as pca_mod
    from pdf_ocr_api_ray.pipelines import probe as probe_mod
    from pdf_ocr_api_ray.pipelines import pq as pq_mod
    from pdf_ocr_api_ray.pipelines import (
        delta,
        graph,
        outliers,
        quant,
        starjoin,
        textindex,
    )
    from pdf_ocr_api_ray.pipelines.extraction import build_extraction

    corpus_path, n_docs, n_chunks = build_corpus()

    # warm-up: spin up worker processes + page cache (untimed)
    rd.read_parquet(corpus_path).count()
    build_extraction(rd.read_parquet(corpus_path).limit(200)).count()

    # headline: extraction end-to-end (read → DAG → write); min of two
    # runs — local-mode wall times vary ±50% run to run (object-store
    # cleanup, VM neighbors), and the best run is the engine's cost.
    # If the two runs disagree by >1.5× the box is contended (the r2
    # driver bench hit exactly this) — take a third run and report all
    # per-run walls so a noisy headline is self-evident.
    out_dir = f"/tmp/graft_bench_out_{NUM_CPUS}"
    import shutil

    def one_headline_run() -> float:
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.time()
        ds = build_extraction(rd.read_parquet(corpus_path))
        ds.write_parquet(out_dir)
        return time.time() - t0

    runs = [one_headline_run(), one_headline_run()]
    if max(runs) / min(runs) > 1.5:
        runs.append(one_headline_run())
    headline = min(runs)

    queries = {}

    headline_only = os.environ.get("GRAFT_HEADLINE_ONLY") == "1"

    def timeq(name, fn, consume="pandas"):
        # scaling legs measure the headline job, not the query sweep —
        # a 4-CPU leg paying the full ~50-key sweep is pure wasted wall
        if headline_only:
            return
        # min of 2: local-mode wall noise (join-actor ramp contention,
        # object-store cleanup) can inflate a single run several-fold
        best = float("inf")
        for _ in range(2):
            t = time.time()
            res = fn(SF_DIR)
            if isinstance(res, rd.Dataset):
                res.to_pandas() if consume == "pandas" else res.count()
            # else: already a materialized driver-side result
            best = min(best, time.time() - t)
        queries[name] = round(best, 3)

    timeq("pricing_summary", relational.pricing_summary)
    timeq("orders_per_nation", relational.orders_per_nation)
    timeq("top_orders", relational.top_orders)
    timeq("token_freq", text.token_freq)
    timeq("lang_id", text.lang_id, consume="count")
    timeq("dedup_exact", dedup.dedup_exact, consume="count")
    timeq("dedup_minhash_lsh", dedup.dedup_minhash_lsh, consume="count")
    timeq("dedup_simhash", dedup.dedup_simhash, consume="count")
    timeq("ann_topk", similarity.ann_topk)
    timeq("sessionize", events.sessionize, consume="count")
    timeq("running_total", events.running_total, consume="count")
    timeq("asof_last_order", events.asof_last_order, consume="count")
    # round-4 additions (keys are additive — earlier rounds' BENCH
    # JSONs stay comparable on the shared keys)
    timeq("dedup_segments", curation.dedup_segments, consume="count")
    timeq("heavy_hitters", text.heavy_hitters, consume="count")
    timeq("epoch_shuffle", sampling.epoch_shuffle, consume="count")
    timeq("extract_main_content", htmlx.extract_main_content, consume="count")
    timeq("dedup_incremental", dedup.dedup_incremental, consume="count")
    timeq("semantic_dedup", semdedup.semantic_dedup, consume="count")
    timeq("dedup_substrings", dedup.dedup_substrings, consume="count")
    timeq("pq_encode", pq_mod.pq_encode, consume="count")
    timeq("bpe_encode", bpe.bpe_encode, consume="count")
    timeq("dsir_select", dsir.dsir_select, consume="count")
    # r5: the fused unigram+bigram count table is built ONCE and shared
    # by bigram_fluency and collocations (each previously rebuilt the
    # identical corpus scan + vocabulary exchange); "gram_tables" times
    # the shared build, and the two consumer keys time only their own
    # post-table work — the pair's combined wall is the sum of the
    # three keys
    _shared_grams = [None]

    def _build_grams(sf):
        _shared_grams[0] = curation.gram_tables(sf)
        return _shared_grams[0]

    timeq("gram_tables", _build_grams, consume="count")
    timeq(
        "bigram_fluency",
        lambda sf: curation.bigram_fluency(sf, grams=_shared_grams[0]),
        consume="count",
    )
    timeq("source_overlap", dedup.source_overlap, consume="count")
    timeq("hard_negatives", similarity.hard_negatives, consume="count")
    # r5: the IVF-cell miners at their pruned (scale-path) configuration
    timeq(
        "hard_negatives_ann",
        lambda sf: similarity.hard_negatives_ann(sf, n_probe_cells=4),
        consume="count",
    )
    timeq(
        "knn_graph_ann",
        lambda sf: similarity.knn_graph_ann(sf, n_probe_cells=4),
        consume="count",
    )
    timeq("tfidf_terms", text.tfidf_terms, consume="count")
    timeq("active_users", events.active_users, consume="count")
    timeq("span_corruption", prep.span_corruption, consume="count")
    timeq("debounce_events", events.debounce_events, consume="count")
    timeq("neural_quality_score", model.neural_quality_score, consume="count")
    timeq(
        "collocations",
        lambda sf: curation.collocations(sf, grams=_shared_grams[0]),
        consume="count",
    )
    timeq("anomaly_days", events.anomaly_days, consume="count")
    timeq("trimmed_stats", events.trimmed_stats, consume="count")
    # r5 third-session additions
    timeq("snapshot_diff", delta.snapshot_diff, consume="count")
    timeq("inverted_index", textindex.inverted_index, consume="count")
    timeq("revenue_by_nation_year", starjoin.revenue_by_nation_year)
    timeq("quantize_embeddings", quant.quantize_embeddings, consume="count")
    timeq("zscore_outliers", outliers.zscore_outliers, consume="count")
    # r5 fourth session: exact-integer PageRank + Markov transitions
    timeq("pagerank_domains", graph.pagerank_domains)
    timeq("event_transitions", events.event_transitions)
    timeq("coalesce_intervals", events.coalesce_intervals, consume="count")
    timeq("global_row_number", sampling.global_row_number, consume="count")
    timeq("event_cooccurrence", events.event_cooccurrence)
    timeq("daily_active_hll", events.daily_active_hll)
    timeq("quality_deciles", text.quality_deciles, consume="count")
    timeq("crawl_priority", graph.crawl_priority, consume="count")
    # r5 late additions: cohort matrix + exact-integer PCA
    timeq("cohort_retention", events.cohort_retention)
    timeq("embedding_pca", pca_mod.embedding_pca, consume="count")
    timeq("quality_probe", probe_mod.quality_probe, consume="count")

    result = {
        "metric": "extraction_e2e_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "headline_runs": [round(r, 3) for r in runs],
        "queries": queries,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "n_chunks": n_chunks,
        "docs_per_sec": round(n_docs / headline, 1),
        "pages_per_sec": round(n_chunks / headline, 1),
    }
    ray.shutdown()
    return result


def run_skew() -> dict:
    """Skew evidence: the same corpus with ONE multi-thousand-chunk
    outlier document appended (the reference's unhandled failure mode —
    a giant doc serializes its whole chunk loop, processJob.js:74-87).
    Reports the wall-time overhead ratio vs the clean corpus; the
    batch-combine + bucketed reassembly should keep it near 1.0."""
    import shutil
    import time as _time

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import pyarrow as pa
    import pyarrow.parquet as pq_
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pdf_ocr_api_ray.pipelines.extraction import build_extraction
    from pdf_ocr_api_ray.schemas import INPUT_SCHEMA
    from pdf_ocr_api_ray.sources.fixtures import generate_doc

    corpus_path, n_docs, n_chunks = build_corpus()
    skew_path = corpus_path + "_skew"
    if not os.path.exists(skew_path):
        os.makedirs(skew_path)
        for f in os.listdir(corpus_path):
            os.link(os.path.join(corpus_path, f), os.path.join(skew_path, f))
        giant = generate_doc("f14_skew", 0, n_chunks=2000)
        giant["doc_id"] = "giant-outlier"
        pq_.write_table(
            pa.Table.from_pylist([giant], schema=INPUT_SCHEMA),
            os.path.join(skew_path, "part-giant.parquet"),
        )

    rd.read_parquet(corpus_path).count()  # warm

    def run(path: str) -> float:
        best = float("inf")
        for _ in range(2):
            shutil.rmtree("/tmp/graft_skew_out", ignore_errors=True)
            t0 = _time.time()
            build_extraction(rd.read_parquet(path)).write_parquet("/tmp/graft_skew_out")
            best = min(best, _time.time() - t0)
        return best

    clean_s = run(corpus_path)
    skew_s = run(skew_path)
    ray.shutdown()
    return {
        "metric": "skew_overhead_ratio",
        "value": round(skew_s / clean_s, 3),
        "unit": "ratio",
        "clean_sec": round(clean_s, 3),
        "skew_sec": round(skew_s, 3),
        "outlier_chunks": 2000,
        "n_docs": n_docs,
        "num_cpus": NUM_CPUS,
    }


def _ray_up():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_actors(concurrency: int) -> dict:
    """Multi-node-shaped configuration A: the parse stage as an ACTOR
    pool (the shape a real model-backed OCR stage uses — weights in
    __init__) vs the default stateless-task path, same corpus."""
    import shutil
    import time as _time

    import ray
    import ray.data as rd

    _ray_up()
    from pdf_ocr_api_ray.pipelines.extraction import build_extraction

    corpus_path, n_docs, _ = build_corpus()
    rd.read_parquet(corpus_path).count()  # warm

    def run(**kw) -> float:
        best = float("inf")
        for _ in range(2):
            shutil.rmtree("/tmp/graft_actor_out", ignore_errors=True)
            t0 = _time.time()
            build_extraction(rd.read_parquet(corpus_path), **kw).write_parquet(
                "/tmp/graft_actor_out"
            )
            best = min(best, _time.time() - t0)
        return best

    tasks_s = run()
    actors_s = run(parse_concurrency=concurrency)

    # the HEAVY-INIT crossover (VERDICT r3 #5): the flagship parser's
    # __init__ binds small dicts, so the pool loses to tasks above —
    # the synthetic model stage (weights built in __init__, stages/
    # model.py) is where the actor pool must WIN: tasks pay the weight
    # build per BATCH, the pool pays it per ACTOR
    from pdf_ocr_api_ray.stages.model import model_features

    docs_ds = rd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    ).materialize()

    def run_model(mode: str) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = _time.time()
            model_features(docs_ds, mode, concurrency=concurrency).count()
            best = min(best, _time.time() - t0)
        return best

    model_tasks_s = run_model("tasks")
    model_actors_s = run_model("actors")
    ray.shutdown()
    return {
        "metric": "parse_actor_pool_sec",
        "value": round(actors_s, 3),
        "unit": "sec",
        "tasks_sec": round(tasks_s, 3),
        "model_stage_actors_sec": round(model_actors_s, 3),
        "model_stage_tasks_sec": round(model_tasks_s, 3),
        "actor_concurrency": concurrency,
        "n_docs": n_docs,
        "num_cpus": NUM_CPUS,
    }


def run_neardup_tables(n_tables: int) -> dict:
    """Multi-node-shaped configuration B: multi-table LSH near-dup
    (boundary-recall mode) vs the single-table default, same input."""
    import time as _time

    import ray

    _ray_up()
    from pdf_ocr_api_ray.pipelines.similarity import embedding_near_dup

    def run(nt: int) -> tuple[float, int]:
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = _time.time()
            rows = embedding_near_dup(SF_DIR, n_tables=nt).count()
            best = min(best, _time.time() - t0)
        return best, rows

    one_s, one_rows = run(1)
    multi_s, multi_rows = run(n_tables)
    ray.shutdown()
    return {
        "metric": "neardup_multitable_sec",
        "value": round(multi_s, 3),
        "unit": "sec",
        "single_table_sec": round(one_s, 3),
        "n_tables": n_tables,
        "pairs_single": one_rows,
        "pairs_multi": multi_rows,
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": NUM_CPUS,
    }


def _shuffle_ab_worker(strategy: str, job: str) -> None:
    """One (strategy, job) measurement in THIS process; prints seconds.
    Isolated per-process because repeated join-mode runs inside one Ray
    session accumulate HashShuffleAggregator actor pools across jobs
    and wedge the local cluster (observed: dataset stalls >13 min at
    ~90% idle after the second job; solo run of the same job: 33 s)."""
    import time as _time

    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    _ray_up()
    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy(strategy)
    if strategy == "hash_shuffle":
        # REQUIRED on a single node: the default cap (64 aggregator
        # actors, gang-scheduled per exchange) exceeds a 32-CPU
        # cluster once a join's own aggregators join the party —
        # measured hard deadlock (300+ workers blocked in ray.get,
        # 0% progress at 600 s; same job with this cap: 22 s).
        ctx.max_hash_shuffle_aggregators = max(2, NUM_CPUS // 4)
    from pdf_ocr_api_ray.pipelines.dedup import dedup_minhash_lsh
    from pdf_ocr_api_ray.pipelines.relational import orders_per_nation

    jobs = {
        "orders_per_nation": lambda: orders_per_nation(SF_DIR).count(),
        "minhash_join_mode": lambda: dedup_minhash_lsh(
            SF_DIR, max_broadcast_pairs=0
        ).count(),
    }
    t0 = _time.time()
    jobs[job]()
    print(json.dumps({"sec": round(_time.time() - t0, 3)}))
    ray.shutdown()


def run_shuffle_ab() -> dict:
    """VERDICT r3 stretch: sort- vs hash-shuffle on the JOIN-heavy
    queries (orders_per_nation's pre-agg+join+groupby chain; minhash
    pair verify FORCED onto its two-Dataset.join routing) so the
    r2 sort-vs-hash decision carries join evidence, not just the
    extraction exchange. Groupbys honor DataContext.shuffle_strategy;
    Dataset.join is natively hash-partitioned either way — the A/B
    isolates what strategy choice does to the surrounding exchanges.
    Every (strategy, job, repeat) runs in a FRESH process (see
    _shuffle_ab_worker)."""

    def one(strategy: str, job: str) -> float:
        best = float("inf")
        for _ in range(2):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--shuffle-ab-worker", strategy, job],
                env=dict(os.environ, RAY_GRAFT_CPUS=str(NUM_CPUS)),
                capture_output=True,
                text=True,
                check=True,
                timeout=600,
            ).stdout
            best = min(best, json.loads(out.strip().splitlines()[-1])["sec"])
        return best

    out: dict = {"metric": "shuffle_ab", "unit": "sec", "num_cpus": NUM_CPUS}
    for strat in ("sort_shuffle_pull_based", "hash_shuffle"):
        for name in ("orders_per_nation", "minhash_join_mode"):
            out[f"{name}@{strat}"] = one(strat, name)
    return out


def run_scaling() -> dict:
    """Same headline job at 8 and 32 CPUs in fresh processes."""

    def run(ncpu: int) -> dict:
        # scaling verdicts need a corpus big enough to amortize fixed
        # startup (the 100-TB regime); ensure ≥32× replication here
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_REPLICATE=str(max(REPLICATE, 32)),
            GRAFT_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # 4 → 16: both levels sit on physical cores. The box advertises 32
    # logical CPUs but memory-bound Arrow work stops scaling past ~16
    # (SMT siblings share ports/bandwidth), so 8→32 measures
    # hyperthreading, not the engine. N→4N on real cores is the honest
    # stand-in for the two-cluster-size rule.
    lo, hi = int(os.environ.get("GRAFT_SCALE_LO", "4")), int(
        os.environ.get("GRAFT_SCALE_HI", "16")
    )
    r_lo = run(lo)
    r_hi = run(hi)
    thr_lo = r_lo["docs_per_sec"]
    thr_hi = r_hi["docs_per_sec"]
    eff = thr_hi / ((hi / lo) * thr_lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "docs_per_sec_lo": thr_lo,
        "docs_per_sec_hi": thr_hi,
        "sf": r_hi["sf"],
        "n_docs": r_hi["n_docs"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--skew" in sys.argv:
        print(json.dumps(run_skew()))
    elif "--actors" in sys.argv:
        i = sys.argv.index("--actors")
        print(json.dumps(run_actors(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 8)))
    elif "--shuffle-ab-worker" in sys.argv:
        i = sys.argv.index("--shuffle-ab-worker")
        _shuffle_ab_worker(sys.argv[i + 1], sys.argv[i + 2])
    elif "--shuffle-ab" in sys.argv:
        print(json.dumps(run_shuffle_ab()))
    elif "--neardup-tables" in sys.argv:
        i = sys.argv.index("--neardup-tables")
        print(
            json.dumps(
                run_neardup_tables(int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 3)
            )
        )
    else:
        print(json.dumps(run_bench()))
