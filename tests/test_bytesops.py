"""Byte-transform family: determinism + round-trip integrity.

The queries project only SQL-checkable columns (raw_len, roundtrip_ok —
the driver oracle); the cipher/deflate BYTES themselves are pinned here
against independent recomputation.
"""

from __future__ import annotations

import zlib

SF = "/root/testdata/sf0.001"


def test_compress_roundtrip_and_rawlen(ray_session):
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.bytesops import compress_payloads

    df = compress_payloads(SF).to_pandas().set_index("doc_id")
    assert df["roundtrip_ok"].all()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    for d in docs[:30]:
        b = d["text"].encode("utf-8")
        assert df.loc[d["doc_id"], "raw_len"] == len(b)
    # the stage's deflate is plain zlib level 6 — deterministic, and on
    # the corpus at large it compresses (short docs may not)
    wins = sum(
        len(zlib.compress(d["text"].encode(), 6)) < len(d["text"].encode()) for d in docs
    )
    assert wins / len(docs) > 0.5


def test_protect_roundtrip_and_cipher_bytes(ray_session):
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.bytesops import protect_keystream, protect_payloads

    df = protect_payloads(SF).to_pandas()
    assert df["roundtrip_ok"].all()

    # pin the cipher itself: keystream is keyed + nonce'd per doc, the
    # XOR round-trips, and two docs never share a stream prefix
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pylist()
    streams = set()
    for d in docs[:20]:
        b = d["text"].encode("utf-8")
        ks = protect_keystream("owner-pass", d["doc_id"], len(b))
        enc = bytes(x ^ y for x, y in zip(b, ks))
        dec = bytes(x ^ y for x, y in zip(enc, ks))
        assert dec == b and enc != b
        streams.add(ks[:16])
        # keyed: a different password yields a different stream
        assert protect_keystream("other", d["doc_id"], 16) != ks[:16]
    assert len(streams) == 20  # per-doc nonce
