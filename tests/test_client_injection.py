"""Client/retry/timeout injection on the actor-pool stages
(stages/clients.py): a user wires a real OCR / LLM / signing endpoint
by swapping a constructor factory — never by editing engine code —
and transient endpoint failures retry under an explicit policy, the
way src/customconfigurations/create-pdf-with-custom-timeouts.js:56
parameterizes the reference's client.

The fake clients are defined INSIDE the test functions on purpose:
cloudpickle serializes function-local classes by value, so Ray's actor
workers never need to import this (non-importable) test module —
exactly how a user's notebook-defined client reaches an actor pool.
"""

from __future__ import annotations

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _flaky_quality_client():
    class FlakyQualityClient:
        """Counting fake endpoint: the FIRST call of every client
        instance raises (a transient), later calls return the attempt
        ordinal as the score — surviving output proves a retry
        happened (the first surviving batch scores 2, never 1)."""

        def __init__(self):
            self.calls = 0

        def score(self, df, timeout_s=None):
            self.calls += 1
            if self.calls == 1:
                raise RuntimeError("transient endpoint failure")
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].astype("int64"),
                    "model_score": float(self.calls),
                    "keep": True,
                }
            )

    return FlakyQualityClient


def test_quality_stage_retries_transient_client_failure(ray_session):
    from pdf_ocr_api_ray.pipelines.model import neural_quality_score
    from pdf_ocr_api_ray.stages.clients import RetryPolicy

    out = neural_quality_score(
        SF,
        concurrency=1,
        client_factory=_flaky_quality_client(),
        retry=RetryPolicy(max_retries=2, backoff_s=0.0),
    ).to_pandas()
    assert len(out) == 500
    # every batch scored on attempt >= 2: the first (failing) call was
    # absorbed by the policy, and no batch ever saw attempt 1
    assert out["model_score"].min() >= 2.0


def test_quality_stage_fail_fast_without_retries(ray_session):
    from pdf_ocr_api_ray.pipelines.model import neural_quality_score
    from pdf_ocr_api_ray.stages.clients import RetryPolicy

    with pytest.raises(Exception):
        neural_quality_score(
            SF,
            concurrency=1,
            client_factory=_flaky_quality_client(),
            retry=RetryPolicy(max_retries=0),
        ).to_pandas()


def test_quality_default_client_unchanged(ray_session):
    """Injection plumbing must be invisible when unused: the default
    factory reproduces the straight-line reference kernel."""
    import pyarrow.parquet as pq

    from pdf_ocr_api_ray.pipelines.model import (
        _load_weights,
        neural_quality_score,
        score_frame,
    )

    got = (
        neural_quality_score(SF)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    docs = (
        pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    want = score_frame(docs, _load_weights())
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))


def test_seal_stage_accepts_custom_signer(ray_session):
    from pdf_ocr_api_ray.pipelines.bytesops import seal_documents

    class StampSealClient:
        """Swapped-in signer: deterministic stamp, no credential digest."""

        def sign(self, ids, fps, timeout_s=None):
            return [f"stamp-{i}-{fp[:8]}" for i, fp in zip(ids, fps)]

    out = seal_documents(SF, client_factory=StampSealClient).to_pandas()
    assert len(out) == 500
    assert out["seal"].str.startswith("stamp-").all()
    # and the default path is untouched by the injection plumbing
    base = seal_documents(SF).to_pandas()
    assert not base["seal"].str.startswith("stamp-").any()


def test_extraction_parse_stage_retries_header_client(ray_session):
    """The flagship DAG with a transiently-failing header endpoint
    (the reference's OpenAI call) injected through the actor-pool
    constructor must produce output identical to the default run —
    the retry policy absorbs the failures; no engine code changes."""
    from pdf_ocr_api_ray.pipelines._util import read_parquet_clean
    from pdf_ocr_api_ray.pipelines.extraction import build_extraction
    from pdf_ocr_api_ray.sources.corpus import documents_batch_to_spans
    from pdf_ocr_api_ray.stages.clients import RetryPolicy

    class FlakyHeaderClient:
        """Header extractor whose first call per actor raises, then
        delegates to the default deterministic extractor."""

        def __init__(self):
            self.calls = 0

        def extract(self, text, depara, timeout_s=None):
            from pdf_ocr_api_ray.functions.header import extract_header

            self.calls += 1
            if self.calls == 1:
                raise TimeoutError("transient header endpoint timeout")
            return extract_header(text, depara)

    def spans_ds():
        docs = read_parquet_clean(
            f"{SF}/documents.parquet", columns=["doc_id", "text"]
        )
        return docs.map_batches(documents_batch_to_spans, batch_format="pyarrow")

    def canon(ds):
        df = ds.to_pandas().sort_values("doc_id", ignore_index=True)
        # the nested servicos/spans columns compare via their repr
        return df[sorted(df.columns)].astype(str)

    base = canon(build_extraction(spans_ds()))
    injected = canon(
        build_extraction(
            spans_ds(),
            header_client_factory=FlakyHeaderClient,
            parse_retry=RetryPolicy(max_retries=3, backoff_s=0.0),
            parse_concurrency=(1, 2),
        )
    )
    assert len(injected) == len(base) > 0
    pd.testing.assert_frame_equal(injected, base)
