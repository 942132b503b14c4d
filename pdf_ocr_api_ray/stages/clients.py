"""Constructor-injected client plumbing for actor-pool stages.

The reference builds its external clients once per process
(DocumentAI: ``worker/processJob.js:12-17``; OpenAI:
``gpt/extractHeader.js:7-9``) and parameterizes their timeouts through
explicit client config (``src/customconfigurations/
create-pdf-with-custom-timeouts.js:56``). The engine's actor stages
mirror that: each stage takes an optional ``client_factory`` (built
ONCE per actor in ``__init__`` — the once-per-process singleton) plus
a ``RetryPolicy`` (retries / backoff / timeout), both shipped through
``map_batches(..., fn_constructor_kwargs=...)``. A user wiring a real
OCR / LLM / signing endpoint swaps the factory WITHOUT touching engine
code; the deterministic stand-ins are just the default factories.

The policy's ``timeout_s`` is handed to the client call as a keyword
(the client owns socket/deadline enforcement, exactly like the
reference's timeout config lives on the client); retries/backoff are
enforced here, uniformly for every stage.
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass(frozen=True)
class RetryPolicy:
    """Per-stage transient-failure policy (picklable; rides
    ``fn_constructor_kwargs`` into the actor).

    ``max_retries`` — additional attempts after the first (0 = fail
    fast); ``backoff_s`` — base sleep before retry ``i`` of
    ``backoff_s * 2**(i-1)`` seconds (0 = immediate, the test
    default); ``timeout_s`` — per-call deadline handed to the client
    (None = client default)."""

    max_retries: int = 2
    backoff_s: float = 0.0
    timeout_s: float | None = None


def call_with_retry(fn, policy: RetryPolicy, /, *args, **kwargs):
    """Run ``fn(*args, **kwargs)`` under ``policy``: re-raise after
    ``max_retries`` extra attempts, exponential backoff between tries.
    Deliberately catches any Exception — a transient classifier is the
    client's job (a client that wants fail-fast errors raises from a
    zero-retry policy or wraps its own)."""
    attempt = 0
    while True:
        try:
            return fn(*args, **kwargs)
        except Exception:
            if attempt >= policy.max_retries:
                raise
            if policy.backoff_s > 0:
                time.sleep(policy.backoff_s * (2**attempt))
            attempt += 1
