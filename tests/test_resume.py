"""Kill-and-resume: a crashed checkpointed run resumes without
reprocessing completed partitions and produces identical output."""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq
import pytest

from pdf_ocr_api_ray.oracle import run_document
from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs
from pdf_ocr_api_ray.state.checkpoint import (
    completed_partitions,
    partition_of,
    read_output,
    run_checkpointed,
)


@pytest.fixture(scope="module")
def input_parquet(tmp_path_factory):
    docs = generate_fixture_docs(
        families=["f1_table_basic", "f6_category_mothers", "f12_multichunk", "f15_empty_and_edge"],
        docs_per_family=8,
    )
    path = str(tmp_path_factory.mktemp("ckpt") / "input.parquet")
    pq.write_table(docs_to_table(docs), path)
    return path, docs


def test_kill_and_resume_equals_uninterrupted(ray_session, depara, input_parquet, tmp_path):
    path, docs = input_parquet
    out_dir = str(tmp_path / "out")

    # "crash" after 2 of 4 partitions
    r1 = run_checkpointed(path, out_dir, num_partitions=4, depara=depara, max_partitions=2)
    assert len(r1["processed"]) == 2
    assert completed_partitions(out_dir) == set(r1["processed"])

    # resume: must skip the completed two and finish the rest
    r2 = run_checkpointed(path, out_dir, num_partitions=4, depara=depara)
    assert set(r2["skipped"]) == set(r1["processed"])
    assert sorted(r2["processed"] + r2["skipped"]) == [0, 1, 2, 3]

    # a third run is a no-op
    r3 = run_checkpointed(path, out_dir, num_partitions=4, depara=depara)
    assert r3["processed"] == []

    # resumed output ≡ oracle for every doc
    table = read_output(out_dir)
    assert table.num_rows == len(docs)
    oracle = {d["doc_id"]: run_document(d["doc_id"], d["spans"], depara) for d in docs}
    for row in table.to_pylist():
        exp = oracle[row["doc_id"]]["spans"]
        got = row["spans"]
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in got] == [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp
        ]


def test_manifest_lineage_and_metrics(ray_session, input_parquet, tmp_path, depara):
    path, docs = input_parquet
    out_dir = str(tmp_path / "out2")
    run_checkpointed(path, out_dir, num_partitions=2, depara=depara)
    lines = [json.loads(x) for x in open(os.path.join(out_dir, "manifest.jsonl"))]
    assert len(lines) == 2
    for line in lines:
        assert line["status"] == "done"
        assert line["input_path"] == path
        assert line["n_docs"] > 0
        assert line["wall_s"] > 0
        assert line["docs_per_s"] > 0
        assert line["stages"], "per-stage metrics missing"
        assert any("wall_s" in v for v in line["stages"].values())
    assert sum(l["n_docs"] for l in lines) == len(docs)


def test_error_lines_are_retried(tmp_path):
    from pdf_ocr_api_ray.state.checkpoint import completed_partitions

    out_dir = str(tmp_path / "err")
    os.makedirs(out_dir)
    with open(os.path.join(out_dir, "manifest.jsonl"), "w") as f:
        f.write(json.dumps({"partition": 0, "status": "done"}) + "\n")
        f.write(json.dumps({"partition": 1, "status": "error", "error": "boom"}) + "\n")
    assert completed_partitions(out_dir) == {0}


def test_partition_assignment_stable():
    assert partition_of("doc-x", 8) == partition_of("doc-x", 8)
    spread = {partition_of(f"doc-{i}", 8) for i in range(100)}
    assert len(spread) == 8


def test_shard_mode_resume(ray_session, depara, tmp_path):
    """Sharded-directory input: partitions own file slices (read
    pruning), and kill-and-resume still completes exactly once."""
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs

    docs = generate_fixture_docs(families=["f1_table_basic", "f13_media_interleaved"], docs_per_family=12)
    in_dir = tmp_path / "sharded"
    in_dir.mkdir()
    tbl = docs_to_table(docs)
    per = 4
    for i in range(0, tbl.num_rows, per):
        pq.write_table(tbl.slice(i, per), str(in_dir / f"shard-{i:03d}.parquet"))

    out_dir = str(tmp_path / "out")
    r1 = run_checkpointed(str(in_dir), out_dir, num_partitions=3, depara=depara, max_partitions=1)
    assert r1["processed"] == [0]
    r2 = run_checkpointed(str(in_dir), out_dir, num_partitions=3, depara=depara)
    assert r2["skipped"] == [0] and sorted(r2["processed"]) == [1, 2]

    table = read_output(out_dir)
    assert table.num_rows == len(docs)
    assert sorted(table.column("doc_id").to_pylist()) == sorted(d["doc_id"] for d in docs)

    lines = [json.loads(x) for x in open(os.path.join(out_dir, "manifest.jsonl"))]
    assert all(line["shards"] for line in lines)  # lineage records file slices


def test_resume_spec_mismatch_fails_fast(ray_session, depara, input_parquet, tmp_path):
    """Resuming with a different partition count, input path, or shard
    listing must refuse (skipping would duplicate/drop documents)."""
    path, _ = input_parquet
    out_dir = str(tmp_path / "out3")
    run_checkpointed(path, out_dir, num_partitions=2, depara=depara, max_partitions=1)

    with pytest.raises(ValueError, match="num_partitions"):
        run_checkpointed(path, out_dir, num_partitions=4, depara=depara)
    with pytest.raises(ValueError, match="input_path"):
        run_checkpointed(path + ".other", out_dir, num_partitions=2, depara=depara)
    # unchanged spec still resumes fine
    r = run_checkpointed(path, out_dir, num_partitions=2, depara=depara)
    assert sorted(r["completed"]) == [0, 1]


def test_resume_shard_listing_mismatch_fails_fast(ray_session, depara, tmp_path):
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs

    docs = generate_fixture_docs(families=["f1_table_basic"], docs_per_family=8)
    in_dir = tmp_path / "sharded"
    in_dir.mkdir()
    tbl = docs_to_table(docs)
    for i in range(0, tbl.num_rows, 2):
        pq.write_table(tbl.slice(i, 2), str(in_dir / f"shard-{i:03d}.parquet"))

    out_dir = str(tmp_path / "out")
    run_checkpointed(str(in_dir), out_dir, num_partitions=2, depara=depara, max_partitions=1)

    # grow the input directory → partition 0's shard slice changes
    pq.write_table(tbl.slice(0, 2), str(in_dir / "shard-999.parquet"))
    with pytest.raises(ValueError, match="shards"):
        run_checkpointed(str(in_dir), out_dir, num_partitions=2, depara=depara)


def test_resume_shard_mode_fallback_fails_fast(ray_session, depara, tmp_path):
    """Shards deleted below num_partitions → the run would silently fall
    back to doc-id hashing; resume must refuse instead."""
    import os

    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs

    docs = generate_fixture_docs(families=["f1_table_basic"], docs_per_family=8)
    in_dir = tmp_path / "sharded"
    in_dir.mkdir()
    tbl = docs_to_table(docs)
    for i in range(0, tbl.num_rows, 2):
        pq.write_table(tbl.slice(i, 2), str(in_dir / f"shard-{i:03d}.parquet"))

    out_dir = str(tmp_path / "out")
    run_checkpointed(str(in_dir), out_dir, num_partitions=2, depara=depara, max_partitions=1)

    # delete shards until fewer than num_partitions remain
    for f in sorted(os.listdir(in_dir))[1:]:
        os.remove(in_dir / f)
    with pytest.raises(ValueError, match="sharded mode"):
        run_checkpointed(str(in_dir), out_dir, num_partitions=2, depara=depara)


def test_resume_hash_to_shard_mode_fails_fast(ray_session, depara, tmp_path):
    """The REVERSE transition: partitions completed in doc-id-hash
    fallback mode (single file / few shards) must refuse to resume in
    shard-ownership mode (input grew to >= num_partitions files) —
    shard mode would re-key ownership and duplicate/drop documents."""
    from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs

    docs = generate_fixture_docs(families=["f1_table_basic"], docs_per_family=8)
    in_dir = tmp_path / "growing"
    in_dir.mkdir()
    tbl = docs_to_table(docs)
    # one file < num_partitions=2 → hash fallback mode
    pq.write_table(tbl, str(in_dir / "shard-000.parquet"))

    out_dir = str(tmp_path / "out")
    run_checkpointed(str(in_dir), out_dir, num_partitions=2, depara=depara, max_partitions=1)

    # grow to 2 files → the run would silently switch to shard mode
    pq.write_table(tbl.slice(0, 2), str(in_dir / "shard-001.parquet"))
    with pytest.raises(ValueError, match="doc-id-hash mode"):
        run_checkpointed(str(in_dir), out_dir, num_partitions=2, depara=depara)


def test_resume_hash_mode_input_growth_fails_fast(ray_session, depara, tmp_path):
    """Input growth while STAYING in hash mode (new file, still below
    num_partitions) must refuse: new documents hash into partitions the
    manifest already marks done and would be silently skipped."""
    from pdf_ocr_api_ray.sources.fixtures import docs_to_table, generate_fixture_docs

    docs = generate_fixture_docs(families=["f1_table_basic"], docs_per_family=8)
    in_dir = tmp_path / "growing2"
    in_dir.mkdir()
    tbl = docs_to_table(docs)
    pq.write_table(tbl, str(in_dir / "shard-000.parquet"))

    out_dir = str(tmp_path / "out")
    run_checkpointed(str(in_dir), out_dir, num_partitions=4, depara=depara, max_partitions=1)

    # add a second file; 2 < 4 partitions → still hash mode, but the
    # document set changed under completed partitions
    pq.write_table(tbl.slice(0, 2), str(in_dir / "shard-001.parquet"))
    with pytest.raises(ValueError, match="listing"):
        run_checkpointed(str(in_dir), out_dir, num_partitions=4, depara=depara)


def test_write_epoch_shards_order_and_resume(ray_session, tmp_path):
    """Shard files read in name order replay the epoch_shuffle
    permutation exactly; a second run skips every existing shard
    (bytes untouched) and a partially-written run completes to the
    identical output."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.sampling import epoch_shuffle, write_epoch_shards

    sf = "/root/testdata/sf0.001"

    out_a = str(tmp_path / "a")
    s1 = write_epoch_shards(sf, out_a, num_shards=8)
    assert (s1["status"] == "written").all()
    assert s1["n_docs"].sum() == 500

    # concatenated shard order == epoch permutation
    shard_dirs = sorted(
        d for d in os.listdir(out_a) if d.startswith("shard=")
    )
    ids_in_order = []
    for d in shard_dirs:
        t = pq.read_table(os.path.join(out_a, d, "part.parquet"))
        ids_in_order.extend(t["doc_id"].to_pylist())
    pos = epoch_shuffle(sf).to_pandas().sort_values("pos")
    assert ids_in_order == pos["doc_id"].tolist()

    # full re-run: everything skipped, bytes untouched
    f0 = os.path.join(out_a, shard_dirs[0], "part.parquet")
    before = open(f0, "rb").read()
    s2 = write_epoch_shards(sf, out_a, num_shards=8)
    assert (s2["status"] == "skipped").all()
    assert open(f0, "rb").read() == before

    # crash simulation: seed dir b with ONLY shard 0 from run a, then
    # run — shard 0 skips, the rest write, output ≡ run a
    out_b = str(tmp_path / "b")
    os.makedirs(out_b)
    import shutil

    shutil.copytree(
        os.path.join(out_a, shard_dirs[0]), os.path.join(out_b, shard_dirs[0])
    )
    s3 = write_epoch_shards(sf, out_b, num_shards=8).set_index("shard")
    assert s3.loc[0, "status"] == "skipped"
    assert (s3.drop(index=0)["status"] == "written").all()
    for d in shard_dirs:
        ta = pq.read_table(os.path.join(out_a, d, "part.parquet"))
        tb = pq.read_table(os.path.join(out_b, d, "part.parquet"))
        assert ta.equals(tb), d
