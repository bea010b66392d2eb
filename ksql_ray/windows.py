"""Window specifications: TUMBLING / HOPPING / SESSION.

Reference: ksql/window.go — type enum at 51-55, time units at 57-63 and
94-109, clause builders at 66-88 and 112-162 (invalid sizes rejected).
Our windows are *assigned* vectorized inside ``map_batches`` over the
designated event-time column (SURVEY.md §2.4): tumbling/hopping are
stateless index arithmetic; session windows are per-key interval merges
closed by the watermark (streaming/state.py).
"""

from __future__ import annotations

import enum

import numpy as np
import pyarrow as pa

from .errors import PlanError


class Unit(enum.Enum):
    """Time units (ksql/window.go:57-63)."""

    MILLISECONDS = 1_000
    SECONDS = 1_000_000
    MINUTES = 60 * 1_000_000
    HOURS = 3_600 * 1_000_000
    DAYS = 86_400 * 1_000_000


MILLISECONDS, SECONDS, MINUTES, HOURS, DAYS = (
    Unit.MILLISECONDS, Unit.SECONDS, Unit.MINUTES, Unit.HOURS, Unit.DAYS,
)


def _us(size: int, unit: Unit) -> int:
    if not isinstance(size, int) or size <= 0:
        raise PlanError(f"window size must be > 0 (ksql/window.go:112-124), got {size}")
    return size * unit.value


class Window:
    kind = "?"

    def assign_ids(self, ts_us: np.ndarray):
        """Vectorized event-time -> window-start assignment.

        Returns (row_indices, window_start_us): tumbling maps 1:1; hopping
        expands each row to the windows containing it (flat-map semantics,
        SURVEY.md §2.4)."""
        raise NotImplementedError


class Tumbling(Window):
    """WINDOW TUMBLING (SIZE n UNIT) — ksql/window.go:66-71,112-124."""

    kind = "tumbling"

    def __init__(self, size: int, unit: Unit = SECONDS):
        self.size_us = _us(size, unit)

    def assign_ids(self, ts_us: np.ndarray):
        ws = (ts_us // self.size_us) * self.size_us
        return np.arange(len(ts_us)), ws

    def window_end(self, start_us: np.ndarray):
        return start_us + self.size_us

    def __repr__(self):
        return f"TUMBLING(size={self.size_us}us)"


class Hopping(Window):
    """WINDOW HOPPING (SIZE n U, ADVANCE BY m U) — ksql/window.go:74-80,127-148.
    A row at time t belongs to every window start ws = k*advance with
    t - size < ws <= t."""

    kind = "hopping"

    def __init__(self, size: int, unit: Unit, advance: int, advance_unit: Unit | None = None):
        self.size_us = _us(size, unit)
        self.advance_us = _us(advance, advance_unit or unit)
        if self.advance_us > self.size_us:
            raise PlanError("HOPPING advance must be <= size (ksql/window.go:127-148)")

    def assign_ids(self, ts_us: np.ndarray):
        a, s = self.advance_us, self.size_us
        k_hi = ts_us // a  # last window index containing t
        k_lo = (ts_us - s) // a + 1  # first window index containing t
        k_lo = np.maximum(k_lo, 0)  # windows are epoch-aligned, start >= 0
        counts = (k_hi - k_lo + 1).astype(np.int64)
        row_idx = np.repeat(np.arange(len(ts_us)), counts)
        # per-expanded-row window index: k_lo[row] + position within row's span
        starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
        pos = np.arange(counts.sum()) - starts[row_idx]
        ws = (k_lo[row_idx] + pos) * a
        return row_idx, ws

    def window_end(self, start_us: np.ndarray):
        return start_us + self.size_us

    def __repr__(self):
        return f"HOPPING(size={self.size_us}us, advance={self.advance_us}us)"


class Session(Window):
    """WINDOW SESSION (gap UNIT) — ksql/window.go:83-88,151-162.
    Assignment is stateful (per-key interval merge); bounded execution sorts
    per key and splits on gaps (exec/groupby.py), streaming keeps open
    sessions in the partition state actor closed by watermark (north_rule)."""

    kind = "session"

    def __init__(self, gap: int, unit: Unit = SECONDS):
        self.gap_us = _us(gap, unit)

    def __repr__(self):
        return f"SESSION(gap={self.gap_us}us)"
