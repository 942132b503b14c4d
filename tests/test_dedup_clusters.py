"""Connected-components dedup clustering (pipelines/dedup.dedup_clusters)
vs a DuckDB recursive-CTE transitive closure computed from first
principles over the exact-Jaccard pair graph.

Not a driver query (the CORRECTNESS harness caps at 50 rows) — this
suite is its correctness gate.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

_CLOSURE_SQL = """
WITH RECURSIVE edges AS (
    SELECT id_a AS u, id_b AS v FROM pairs
    UNION
    SELECT id_b, id_a FROM pairs
),
nodes AS (SELECT DISTINCT u AS n FROM edges),
reach(src, node) AS (
    SELECT n, n FROM nodes
    UNION
    SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.node
),
reps AS (SELECT node, min(src) AS cluster_rep FROM reach GROUP BY node),
sizes AS (SELECT cluster_rep, count(*) AS cluster_size FROM reps GROUP BY cluster_rep)
SELECT r.node AS doc_id, r.cluster_rep, s.cluster_size
FROM reps r JOIN sizes s ON s.cluster_rep = r.cluster_rep
"""


def test_clusters_match_recursive_closure(ray_session):
    from pdf_ocr_api_ray.oracles import dedup_minhash_lsh_sql
    from pdf_ocr_api_ray.pipelines.dedup import dedup_clusters

    got = (
        dedup_clusters(SF)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
        .astype("int64")
    )
    assert len(got) > 0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    con.execute("CREATE TEMP TABLE pairs AS " + dedup_minhash_lsh_sql())
    exp = (
        con.execute(_CLOSURE_SQL)
        .df()
        .sort_values("doc_id", ignore_index=True)
        .astype("int64")
    )
    pd.testing.assert_frame_equal(got, exp)


def test_chain_transitivity(ray_session, tmp_path):
    """A≈B≈C≈D chain where non-adjacent docs are BELOW the pair
    threshold: pairwise output alone would split the chain; clustering
    must put all four in one component with rep = min id."""
    from pdf_ocr_api_ray.pipelines.dedup import dedup_clusters, dedup_minhash_lsh

    words = [f"tok{i:03d}" for i in range(40)]
    # sliding windows of 20 tokens, stride 3: consecutive docs share
    # 17/23 tokens (3-shingle Jaccard well above 0.6), distance-2 share
    # 14/26 (shingle Jaccard far below 0.6)
    texts = [" ".join(words[s : s + 20]) for s in (0, 3, 6, 9)]
    rows = list(zip([11, 12, 13, 14], texts))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    sf = str(tmp_path)

    pair_df = dedup_minhash_lsh(sf).to_pandas()
    got_pairs = set(zip(pair_df["id_a"], pair_df["id_b"]))
    assert (11, 12) in got_pairs and (12, 13) in got_pairs and (13, 14) in got_pairs
    assert (11, 14) not in got_pairs  # the chain is NOT a clique

    # the standard corpus augmentation also plants a mutated copy of
    # doc 14 (14 % 7 == 0 → id 2000014, first token doubled, J ≈ 0.95)
    # — it hangs off the chain's end and must land in the same component
    out = dedup_clusters(sf).to_pandas().sort_values("doc_id", ignore_index=True)
    assert out["doc_id"].tolist() == [11, 12, 13, 14, 2000014]
    assert set(out["cluster_rep"]) == {11}
    assert set(out["cluster_size"]) == {5}


def test_no_edges_empty_schema(ray_session, tmp_path):
    from pdf_ocr_api_ray.pipelines.dedup import dedup_clusters

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["aa bb cc dd", "ee ff gg hh", "ii jj kk ll"], pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    out = dedup_clusters(str(tmp_path))
    assert out.count() == 0
    assert out.schema().names == ["doc_id", "cluster_rep", "cluster_size"]


def test_long_chain_converges_and_short_budget_refuses(ray_session, tmp_path):
    """A 12-doc chain (diameter 11): the default round budget must
    converge to ONE component; an insufficient budget must RAISE
    rather than silently return split clusters."""
    from pdf_ocr_api_ray.pipelines.dedup import dedup_clusters

    words = [f"tok{i:03d}" for i in range(60)]
    texts = [" ".join(words[s : s + 20]) for s in range(0, 36, 3)]  # 12 windows
    ids = [101 + 2 * i for i in range(12)]  # odd ids: no %5/%7... keep simple
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    sf = str(tmp_path)

    out = dedup_clusters(sf).to_pandas()
    # augmentation may attach copies of ids divisible by 5/7 — every
    # original chain doc must share ONE representative regardless
    reps = out[out["doc_id"].isin(ids)]["cluster_rep"].unique()
    assert len(reps) == 1 and reps[0] == min(ids)

    with pytest.raises(RuntimeError, match="fixpoint"):
        dedup_clusters(sf, max_rounds=3)


def test_checkpoint_resume_matches_uninterrupted(ray_session, tmp_path):
    """VERDICT r3 #7: a killed round-k propagation (here: the loud
    non-convergence refusal at an insufficient round budget) must
    resume AT round k from the persisted label tables — and the
    resumed output must equal an uninterrupted run bit-for-bit."""
    from pdf_ocr_api_ray.pipelines.dedup import dedup_clusters

    words = [f"tok{i:03d}" for i in range(60)]
    texts = [" ".join(words[s : s + 20]) for s in range(0, 36, 3)]  # 12-doc chain
    ids = [101 + 2 * i for i in range(12)]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        os.path.join(str(tmp_path), "documents.parquet"),
    )
    sf = str(tmp_path)
    ckpt = os.path.join(str(tmp_path), "ckpt")

    base = dedup_clusters(sf).to_pandas().sort_values("doc_id", ignore_index=True)

    # "killed" run: budget below the chain diameter → refuses loudly,
    # but rounds 1..5 are already persisted
    with pytest.raises(RuntimeError, match="fixpoint"):
        dedup_clusters(sf, max_rounds=5, checkpoint_dir=ckpt)
    done = sorted(os.listdir(ckpt))
    assert done == [f"round_{k:04d}" for k in range(1, 6)]
    mtimes = {d: os.path.getmtime(os.path.join(ckpt, d, "_round.json")) for d in done}

    # resume with a sufficient budget: picks up at round 5
    got = (
        dedup_clusters(sf, checkpoint_dir=ckpt)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, base)
    for d in done:  # the resumed run must NOT have recomputed rounds 1..5
        assert os.path.getmtime(os.path.join(ckpt, d, "_round.json")) == mtimes[d]
    assert len(os.listdir(ckpt)) > 5  # and it really continued past them


def test_dedup_survivors_policies_diverge(ray_session):
    """'longest' picks the mutant copy (one token longer than its
    source) where 'min_id' picks the canonical smallest id — the two
    policies must agree on cluster structure and genuinely differ on
    survivor choice for mutant clusters."""
    import pandas as pd

    from pdf_ocr_api_ray.pipelines.dedup import dedup_survivors

    sf = "/root/testdata/sf0.001"
    lg = dedup_survivors(sf, policy="longest").to_pandas().sort_values("cluster_rep").reset_index(drop=True)
    mi = dedup_survivors(sf, policy="min_id").to_pandas().sort_values("cluster_rep").reset_index(drop=True)
    # identical cluster structure
    pd.testing.assert_frame_equal(
        lg[["cluster_rep", "cluster_size"]], mi[["cluster_rep", "cluster_size"]]
    )
    # min_id survivor IS the rep; longest diverges wherever a mutant
    # (strictly longer) lives in the cluster
    assert (mi["survivor_id"] == mi["cluster_rep"]).all()
    mutant_clusters = lg[lg["survivor_id"] >= 2_000_000]
    assert len(mutant_clusters) > 0
    # natural near-dup clusters may also pick a longer base member, so
    # divergence below 1M is legitimate; cluster structure equality
    # above is the membership sanity check

    import pytest

    with pytest.raises(ValueError, match="unknown policy"):
        dedup_survivors(sf, policy="nope")
