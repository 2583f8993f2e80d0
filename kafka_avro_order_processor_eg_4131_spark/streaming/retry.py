"""Bounded retry with backoff around sink writes — F3 in SURVEY.md §2.6.

The reference defines ``process_message_with_retry`` (consumer.py:278-314,
dormant dead code): up to MAX_RETRIES=3 attempts with linear backoff
``0.5 * attempt`` seconds (0.5/1.0/1.5 — the comment at consumer.py:306
says "exponential", the code is linear; we implement the code). The
engine applies it where it actually belongs in Spark's model: around
whole-sink writes inside foreachBatch. Per-record compute retries are
covered by ``spark.task.maxFailures``; batch replay from the checkpoint
covers everything else.
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

from ..schemas import MAX_RETRIES

T = TypeVar("T")

BACKOFF_BASE_SECONDS = 0.5  # consumer.py:307: time.sleep(0.5 * retry_count)


def with_retry(
    fn: Callable[[], T],
    max_retries: int = MAX_RETRIES,
    backoff_base: float = BACKOFF_BASE_SECONDS,
    on_exhausted: Callable[[Exception], T] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run ``fn``; on failure retry up to ``max_retries`` times with
    linear backoff. When retries are exhausted: call ``on_exhausted``
    (the DLQ hand-off in the pipeline — consumer.py:310-313) or re-raise.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except Exception as exc:
            attempt += 1
            if attempt > max_retries:
                if on_exhausted is not None:
                    return on_exhausted(exc)
                raise
            sleep(backoff_base * attempt)
