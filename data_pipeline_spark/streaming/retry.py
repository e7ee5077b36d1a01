"""S6: retry with exponential backoff + jitter, as a composable utility.

Spark already retries TASKS (spark.task.maxFailures); this covers the layer
Spark doesn't: driver-side steps of the epoch loop — a flaky object-store
commit, a transient listing error — mirroring the reference's fetch retry
(/root/reference/src/fetcher/html_fetcher.rs:169-193: 1000·2^attempt ms plus
0-1000 ms jitter, 3 retries).

Retrying a whole epoch is SAFE by construction: `LakeTable.merge` is
idempotent per epoch (the commit ledger), so a retry after a failure that
actually committed is a structural no-op — the reference can only offer
at-least-once on retry; here retry composes with exactly-once.

Jitter is seeded and deterministic (same discipline as the datagen): tests
and replays of the retry schedule are reproducible.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable


class RetriesExhausted(RuntimeError):
    def __init__(self, attempts: int, last: BaseException):
        super().__init__(f"failed after {attempts} attempts: {last!r}")
        self.attempts = attempts
        self.last = last


def with_retries(
    fn: Callable[[], "object"],
    max_retries: int = 3,
    base_ms: int = 1000,
    jitter_ms: int = 1000,
    seed: int = 42,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException, float], None] | None = None,
):
    """Call ``fn`` with up to ``max_retries`` retries; delay before retry
    ``a`` (0-based) is ``base_ms * 2**a + uniform(0, jitter_ms)`` ms.
    Raises :class:`RetriesExhausted` carrying the last error."""
    rng = random.Random(seed)
    last: BaseException | None = None
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except retry_on as e:  # noqa: PERF203 — retry loop by design
            last = e
            if attempt == max_retries:
                raise RetriesExhausted(attempt + 1, e) from e
            delay = (base_ms * (2 ** attempt) + rng.uniform(0, jitter_ms)) / 1000.0
            if on_retry is not None:
                on_retry(attempt, e, delay)
            sleep(delay)
    raise RetriesExhausted(max_retries + 1, last)  # pragma: no cover
