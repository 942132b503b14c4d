"""Per-document byte transforms — the compress/protect/linearize sample
families (SURVEY.md §2.3: src/compresspdf/*, src/protectpdf/*,
src/linearizepdf/*) over real binary payloads.

The corpus has no PDF bytes, so the payload column is derived
deterministically (utf-8 of the text — the transform plumbing is what
the family defines: opaque bytes in → params → opaque bytes out, as a
stateless vectorized map). All ops run zlib/hashlib kernels per batch;
round-trip integrity is the test oracle (tests/test_bytesops.py).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ._util import read_parquet_clean
from ..stages.clients import RetryPolicy, call_with_retry


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _payload_ds(sf_dir: str):
    """documents → (doc_id, payload: binary) — the opaque-bytes column."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def to_bytes(t: pa.Table) -> pa.Table:
        payload = pa.array([x.encode("utf-8") for x in t["text"].to_pylist()], pa.binary())
        return pa.table({"doc_id": t["doc_id"], "payload": payload})

    return ds.map_batches(to_bytes, batch_format="pyarrow")


class _DigestSealClient:
    """Default signing 'endpoint': keyed digest over (doc identity,
    content fingerprint) — credential held in the client only."""

    def __init__(self, credential: str):
        self._credential = credential

    def sign(self, ids, fps, timeout_s: float | None = None) -> list[str]:
        return [
            hashlib.md5(f"{self._credential}|{i}|{fp}".encode()).hexdigest()
            for i, fp in zip(ids, fps)
        ]


class SealSigner:
    """electronicseal analogue (src/electronicseal/electronic-seal.js:
    119-130): a credential-holding ACTOR pool signs every document.
    The signing credential rides in the actor constructor — built once
    per actor, never present in batch data or the output — mirroring
    the reference's sealing-credential object (client id / PIN). The
    'signature' is a keyed digest over (doc identity, content
    fingerprint); the demo credential is fixed so the SQL oracle can
    countersign."""

    def __init__(self, credential: str = "demo-credential", client_factory=None, retry=None):
        # the signing client is built once per actor; a real TSP/HSM
        # endpoint is a factory swap (stages/clients.py), not an edit
        self._client = (
            client_factory() if client_factory else _DigestSealClient(credential)
        )
        self._retry = retry or RetryPolicy()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = t["text"].to_pylist()
        fps = [hashlib.md5((x or "").encode("utf-8")).hexdigest() for x in texts]
        seals = call_with_retry(
            self._client.sign, self._retry, ids, fps, timeout_s=self._retry.timeout_s
        )
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "content_fp": pa.array(fps, pa.string()),
                "seal": pa.array(seals, pa.string()),
            }
        )


def seal_documents(
    sf_dir: str, concurrency: int = 2, client_factory=None, retry=None
):
    """Sign every document with the credential actor pool (stateful
    stage: secrets load once per actor in __init__, exactly like model
    weights in the OCR stage). ``client_factory`` / ``retry`` inject a
    real signing endpoint + transient-failure policy per
    stages/clients.py."""
    import ray.data as rd

    ds = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
    return ds.map_batches(
        SealSigner,
        concurrency=concurrency,
        batch_format="pyarrow",
        fn_constructor_kwargs={"client_factory": client_factory, "retry": retry},
    )


def protect_keystream(password: str, doc_id, n: int) -> bytes:
    """The keyed stream for one payload (nonce = doc_id). Exposed so
    tests can pin the cipher bytes the query no longer projects."""
    key = hashlib.sha256(password.encode()).digest()
    nonce = str(doc_id).encode()
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(key + nonce + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:n])


def xor_bytes(b: bytes, ks: bytes) -> bytes:
    """b ⊕ ks, vectorized (both same length)."""
    if not b:
        return b
    return (
        np.frombuffer(b, dtype=np.uint8) ^ np.frombuffer(ks, dtype=np.uint8)
    ).tobytes()


def compress_payloads(sf_dir: str, level: int = 6):
    """compresspdf analogue: deflate each payload and verify the
    decompress round-trip in-stage. The driver-checkable projection is
    (raw_len, roundtrip_ok) — compressed byte digests aren't
    SQL-reproducible, so they're pinned by tests/test_bytesops.py
    instead (the kernel itself is unchanged)."""
    ds = _payload_ds(sf_dir)

    def compress(t: pa.Table) -> pa.Table:
        raw = t["payload"].to_pylist()
        comp = [zlib.compress(b, level) for b in raw]
        ok = [zlib.decompress(c) == b for c, b in zip(comp, raw)]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "raw_len": pa.array([len(b) for b in raw], pa.int64()),
                "roundtrip_ok": pa.array(ok, pa.bool_()),
            }
        )

    return ds.map_batches(compress, batch_format="pyarrow")


def protect_payloads(sf_dir: str, password: str = "owner-pass"):
    """protectpdf analogue: keyed transform of the payload (HMAC-keyed
    stream XOR — stand-in for AES_256; the pipeline shape is the point)
    + removeprotection round-trip marker."""
    ds = _payload_ds(sf_dir)

    def protect(df: pd.DataFrame) -> pd.DataFrame:
        raw_len = []
        restored_ok = []
        for doc_id, b in zip(df["doc_id"], df["payload"]):
            ks = protect_keystream(password, doc_id, len(b))
            # vectorized keystream XOR (numpy uint8) — byte-identical to
            # the per-byte loop at ~100× the throughput on MB payloads
            enc = xor_bytes(b, ks)
            dec = xor_bytes(enc, ks)
            raw_len.append(len(b))
            # the cipher output digest isn't SQL-reproducible; the
            # driver-checkable signal is the in-stage round-trip
            # (remove-protection restores the original bytes) — cipher
            # bytes are pinned by tests/test_bytesops.py
            restored_ok.append(dec == b and (enc != b or not b))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "raw_len": pd.Series(raw_len, dtype="int64"),
                "roundtrip_ok": restored_ok,
            }
        )

    return ds.map_batches(protect, batch_format="pandas")
