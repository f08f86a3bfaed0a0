"""Sink retry with exponential backoff — twin of the reference's tenacity
wrapper around MongoDB batch writes (spark_streaming/streaming_job.py:535-550:
wait_exponential 2s..300s).

The reference retries FOREVER (MAX_RETRY_DURATION = float('inf') with a
comment claiming 24h — streaming_job.py:91, a bug catalogued in SURVEY.md
§4.4-2); we bound attempts so a poisoned batch eventually surfaces instead
of wedging the stream.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable

log = logging.getLogger(__name__)

BASE_DELAY_SECONDS = 2.0  # streaming_job.py: wait_exponential multiplier
MAX_DELAY_SECONDS = 300.0  # streaming_job.py: wait cap
MAX_ATTEMPTS = 5  # bounded, unlike the reference's inf (SURVEY §4.4-2)


def with_retry(
    fn: Callable[[], None],
    max_attempts: int = MAX_ATTEMPTS,
    base_delay: float = BASE_DELAY_SECONDS,
    max_delay: float = MAX_DELAY_SECONDS,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> int:
    """Run fn() retrying on failure with exponential backoff
    (base * 2^n, capped).  Returns the number of attempts used; re-raises
    the last error once attempts are exhausted.  `sleep` is injectable so
    tests run instantly."""
    attempt = 0
    while True:
        attempt += 1
        try:
            fn()
            return attempt
        except retry_on as exc:
            if attempt >= max_attempts:
                log.error("sink write failed after %d attempts: %s", attempt, exc)
                raise
            delay = min(base_delay * (2 ** (attempt - 1)), max_delay)
            log.warning(
                "sink write attempt %d/%d failed (%s); retrying in %.1fs",
                attempt,
                max_attempts,
                exc,
                delay,
            )
            sleep(delay)
