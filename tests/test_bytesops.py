"""Byte-transform family: determinism + round-trip integrity."""

from __future__ import annotations

import hashlib
import zlib

SF = "/root/testdata/sf0.001"


def test_compress_deterministic_and_consistent(ray_session):
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.bytesops import compress_payloads

    df = compress_payloads(SF).to_pandas().set_index("doc_id")
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    for d in docs[:30]:
        b = d["text"].encode("utf-8")
        c = zlib.compress(b, 6)
        row = df.loc[d["doc_id"]]
        assert row["raw_len"] == len(b)
        assert row["compressed_len"] == len(c)
        assert row["compressed_sha"] == hashlib.sha256(c).hexdigest()[:16]
    assert (df["compressed_len"] < df["raw_len"]).mean() > 0.9  # text compresses


def test_protect_roundtrip(ray_session):
    from pdf_ocr_api_ray.pipelines.bytesops import protect_payloads

    df = protect_payloads(SF).to_pandas()
    assert df["roundtrip_ok"].all()
    assert df["protected_sha"].nunique() == len(df)  # nonce per doc
