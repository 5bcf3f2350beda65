"""Watermarked stream-stream interval join — continuous event
attribution (each left event collects the right events that landed
within ``max_delay_ms`` after it: fetch -> outlink clicks, impression
-> conversion, request -> retries).

This is the streaming twin of ``operators.joins.range_join`` with the
left side as the implicit interval ``[left_time, left_time +
max_delay_ms)``: the SAME function applied to batch frames (where
``withWatermark`` is a no-op) produces the identical result, which is
how the pytest gates it — stream output == batch twin == range_join.

Scale shape (Structured Streaming's own state machinery, no custom
code): both sides shuffle once on the equality keys; the time-range
condition bounds the state — a left row is evicted once the right
watermark passes ``left_time + max_delay``, a right row once the left
watermark passes it, so state is O(key-rate x window), never
unbounded. Late rows (behind the watermark) find no state and emit
nothing — the documented, tested drop semantics. Inner join only:
stream-stream outer joins emit on watermark expiry, which an
attribution pipeline rarely wants (absence is queryable downstream).
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_time: str,
    right_time: str,
    *,
    max_delay_ms: int,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Join every left event to the right events with the same keys
    and ``left_time <= right_time < left_time + max_delay_ms``
    (half-open, the range_join convention). Works on streaming OR
    batch frames — the batch result is the exact expected value of the
    stream (pytest-asserted). Output: all left columns, then right's
    non-key columns (names must not collide).

    ``watermark`` bounds how out-of-order each side may be; it is also
    the state-retention knob (total state horizon = watermark +
    max_delay on the left side)."""
    keys = [on] if isinstance(on, str) else list(on)
    if max_delay_ms <= 0:
        raise ValueError(f"max_delay_ms must be positive: {max_delay_ms}")
    payload = [c for c in right.columns if c not in keys]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload collides with left columns: {clash}")

    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    conds = [lw[k] == rw[k] for k in keys] + [
        rw[right_time] >= lw[left_time],
        rw[right_time]
        < lw[left_time] + F.expr(f"INTERVAL {int(max_delay_ms)} MILLISECONDS"),
    ]
    joined = lw.join(rw, reduce(lambda a, b: a & b, conds), "inner")
    return joined.select(
        *[lw[c] for c in left.columns],
        *[rw[c] for c in payload],
    )
