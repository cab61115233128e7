"""Per-key rate limiter — the reference's politeness state (SURVEY.md §2.3
T1; backend/app/utils/rate_limiter.py:7-121) re-expressed for Ray.

Not needed for Parquet ingest, but it is the canonical "actor holding per-key
mutable state" pattern for any live-fetch extra: a plain ``RateLimiter``
class with the reference's semantics (per-domain last-request clock,
min-interval wait, next-allowed query, reset), plus ``RateLimiterActor`` —
the same object behind ``@ray.remote`` so many fetch tasks share one
politeness clock (the reference ran single-threaded and kept it in-process;
a cluster needs the state centralized or key-sharded).
"""

from __future__ import annotations

import asyncio
import time
from typing import Dict, Optional

import ray


class RateLimiter:
    def __init__(self, requests_per_second: float = 1.0):
        if requests_per_second <= 0:
            raise ValueError("requests_per_second must be positive")
        self.min_interval = 1.0 / requests_per_second
        self.last_request_time: Dict[str, float] = {}

    def seconds_until_allowed(self, key: str, now: Optional[float] = None) -> float:
        now = time.monotonic() if now is None else now
        last = self.last_request_time.get(key)
        if last is None:
            return 0.0
        return max(0.0, self.min_interval - (now - last))

    def try_acquire(self, key: str, now: Optional[float] = None) -> bool:
        """Non-blocking acquire: True (and stamps the clock) if allowed now."""
        now = time.monotonic() if now is None else now
        if self.seconds_until_allowed(key, now) > 0:
            return False
        self.last_request_time[key] = now
        return True

    def wait(self, key: str) -> float:
        """Blocking acquire (reference sync path). Returns seconds slept."""
        slept = 0.0
        while True:
            delay = self.seconds_until_allowed(key)
            if delay <= 0:
                self.last_request_time[key] = time.monotonic()
                return slept
            time.sleep(delay)
            slept += delay

    async def wait_async(self, key: str) -> float:
        """Async acquire (reference crawler path, rate_limiter.py:37-63)."""
        slept = 0.0
        while True:
            delay = self.seconds_until_allowed(key)
            if delay <= 0:
                self.last_request_time[key] = time.monotonic()
                return slept
            await asyncio.sleep(delay)
            slept += delay

    def reset(self, key: Optional[str] = None) -> None:
        if key is None:
            self.last_request_time.clear()
        else:
            self.last_request_time.pop(key, None)


@ray.remote
class RateLimiterActor:
    """Cluster-shared politeness clock: fetch tasks call
    ``ray.get(limiter.acquire.remote(domain))`` and sleep the returned delay
    locally (the actor never blocks, so one slow domain cannot stall
    others)."""

    def __init__(self, requests_per_second: float = 1.0):
        self._rl = RateLimiter(requests_per_second)

    def acquire(self, key: str) -> float:
        """Reserve the next slot for ``key``; returns seconds the CALLER
        should sleep before issuing its request."""
        now = time.monotonic()
        delay = self._rl.seconds_until_allowed(key, now)
        # stamp the reserved slot so concurrent callers serialize per key
        self._rl.last_request_time[key] = now + delay
        return delay

    def reset(self, key: Optional[str] = None) -> None:
        self._rl.reset(key)
