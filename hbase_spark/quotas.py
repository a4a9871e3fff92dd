"""Space + throttle quotas.

Reference surface: ``client/Admin.java`` setQuota/getQuotaSettings,
``hbase-client/.../quotas/SpaceViolationPolicy.java`` (DISABLE,
NO_WRITES_COMPACTIONS, NO_WRITES, NO_INSERTS),
``hbase-client/.../quotas/ThrottleType.java``, and the server-side
enforcement in ``hbase-server/.../quotas/RegionServerSpaceQuotaManager
.java`` / ``FixedIntervalRateLimiter.java`` /
``AverageIntervalRateLimiter.java``.

Mapping to this engine:

* A **space quota** limits the on-disk bytes of a table's persisted
  layout (the region-dir ContentSummary the reference's
  FileSystemUtilizationChore measures).  Enforcement happens at the
  write paths that actually materialize bytes — ``Admin.flush``,
  ``Admin.major_compact`` and the region split/merge rewrites — via
  ``check_space_quota``; ``enforce_quotas`` is the QuotaObserverChore
  analog that snapshots usage for every table with a quota and applies
  the DISABLE policy.
* A **throttle quota** is stored settings (user/table scoped, most
  specific wins) plus a real token-bucket ``RateLimiter`` whose refill
  semantics follow FixedIntervalRateLimiter (full refill each interval)
  or AverageIntervalRateLimiter (pro-rata refill).  Time is injected so
  tests are deterministic; ``BufferedMutator`` can consume WRITE_NUMBER
  tokens per buffered mutation.
"""

from __future__ import annotations

SPACE_POLICIES = (
    "DISABLE",
    "NO_WRITES_COMPACTIONS",
    "NO_WRITES",
    "NO_INSERTS",
)

THROTTLE_TYPES = (
    "REQUEST_NUMBER",
    "REQUEST_SIZE",
    "WRITE_NUMBER",
    "WRITE_SIZE",
    "READ_NUMBER",
    "READ_SIZE",
)


class SpaceLimitingException(RuntimeError):
    """quotas/SpaceLimitingException analog — a write was rejected
    because the table is in violation of its space quota."""

    def __init__(self, table: str, policy: str, usage: int, limit: int):
        self.table, self.policy = table, policy
        self.usage, self.limit = usage, limit
        super().__init__(
            f"table {table!r} violates space quota "
            f"({usage} > {limit} bytes, policy {policy})"
        )


class RpcThrottlingException(RuntimeError):
    """quotas/RpcThrottlingException analog.

    ``wait_ms``: how long until enough tokens are available, mirroring
    the reference's waitInterval carried in the exception."""

    def __init__(self, kind: str, wait_ms: int):
        self.kind, self.wait_ms = kind, wait_ms
        super().__init__(f"{kind} quota exceeded, retry in {wait_ms}ms")


class RateLimiter:
    """Token bucket with injectable time.

    ``refill='fixed'`` — FixedIntervalRateLimiter.java: the bucket
    resets to ``limit`` at each interval boundary.  ``refill='average'``
    — AverageIntervalRateLimiter.java: tokens accrue pro-rata with
    elapsed time (capped at ``limit``)."""

    def __init__(self, limit: int, interval_ms: int = 1000, *,
                 refill: str = "fixed"):
        if refill not in ("fixed", "average"):
            raise ValueError(f"unknown refill policy {refill!r}")
        self.limit = int(limit)
        self.interval_ms = int(interval_ms)
        self.refill = refill
        self.avail = self.limit
        self._last_ms: int | None = None

    def _tick(self, now_ms: int) -> None:
        if self._last_ms is None:
            self._last_ms = now_ms
            return
        delta = now_ms - self._last_ms
        if delta <= 0:
            return
        if self.refill == "fixed":
            if delta >= self.interval_ms:
                self.avail = self.limit
                self._last_ms = now_ms
        else:
            add = self.limit * delta // self.interval_ms
            if add > 0:
                self.avail = min(self.limit, self.avail + add)
                self._last_ms = now_ms

    def can_execute(self, amount: int, *, now_ms: int) -> bool:
        self._tick(now_ms)
        return self.avail >= amount

    def consume(self, amount: int, *, now_ms: int) -> None:
        """Take ``amount`` tokens or raise RpcThrottlingException with
        the wait the reference would return (waitInterval)."""
        self._tick(now_ms)
        if self.avail < amount:
            missing = amount - self.avail
            if self.refill == "fixed":
                wait = self.interval_ms - (
                    0 if self._last_ms is None
                    else (now_ms - self._last_ms)
                )
                wait = max(1, wait)
            else:
                wait = max(
                    1, -(-missing * self.interval_ms // max(1, self.limit))
                )
            raise RpcThrottlingException("throttle", wait)
        self.avail -= amount


def limiter_from_setting(setting: dict) -> RateLimiter:
    """Build a RateLimiter from a stored throttle-quota setting."""
    return RateLimiter(
        setting["limit"],
        setting.get("interval_ms", 1000),
        refill=setting.get("refill", "fixed"),
    )


class ExceedGate:
    """quotas/ExceedOperationQuota.java: when exceed-throttle is
    enabled, the region server quota is the hard machine-level cap —
    checked first, always consumed — and a request the user/table
    limiter can't cover EXCEEDS it by drawing the whole amount from
    the region server bucket instead (the reference grabs only the RS
    quota on the exceed path, so the user's bucket refills normally)."""

    def __init__(self, primary: RateLimiter, regionserver: RateLimiter):
        self.primary = primary
        self.regionserver = regionserver

    def can_execute(self, amount: int, *, now_ms: int) -> bool:
        return self.regionserver.can_execute(amount, now_ms=now_ms)

    def consume(self, amount: int, *, now_ms: int) -> None:
        if not self.regionserver.can_execute(amount, now_ms=now_ms):
            # the machine-level quota is never exceedable
            self.regionserver.consume(amount, now_ms=now_ms)
        if self.primary.can_execute(amount, now_ms=now_ms):
            self.primary.consume(amount, now_ms=now_ms)
        self.regionserver.consume(amount, now_ms=now_ms)
