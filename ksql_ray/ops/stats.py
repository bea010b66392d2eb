"""Side-channel diagnostics for distributed op pipelines.

The LSH dedup stages cap pathological buckets (star pairs instead of
all-pairs) and drop malformed store-join segments; both were previously
silent, which reads as "covered everything" when it didn't. A named
zero-CPU counter actor collects these events from worker tasks
(fire-and-forget — one call per partition, never per row), and the
caller reads the totals after the pipeline is consumed:

    pairs = minhash_dedup_pairs(ds).take_all()
    print(collect_op_stats())   # {"minhash.capped_buckets": 3, ...}

A failure to record never fails the pipeline (diagnostics only).
"""

from __future__ import annotations

import ray

_ACTOR_NAME = "ksql_ray_op_stats"


@ray.remote(num_cpus=0)
class _OpStatsActor:
    def __init__(self):
        self._c: dict[str, int] = {}

    def add(self, kv: dict) -> None:
        for k, v in kv.items():
            self._c[k] = self._c.get(k, 0) + int(v)

    def snapshot(self, reset: bool) -> dict:
        out = dict(self._c)
        if reset:
            self._c = {}
        return out


_driver_handle = None  # keeps the named actor alive (it is refcounted:
# a handle created inside a worker task dies with that task)


def ensure_stats_actor():
    """Create (or fetch) the counter actor from the DRIVER and pin its
    handle for the process lifetime. Op entry points call this at plan
    build time so worker-side ``record_stats`` finds it by name."""
    global _driver_handle
    if _driver_handle is None:
        _driver_handle = _OpStatsActor.options(
            name=_ACTOR_NAME, get_if_exists=True, namespace="ksql_ray"
        ).remote()
    return _driver_handle


def record_stats(prefix: str, **kv) -> None:
    """Fire-and-forget counter increments from inside a worker task.
    No-op (counters dropped) if no driver ever created the actor."""
    kv = {f"{prefix}.{k}": v for k, v in kv.items() if v}
    if not kv:
        return
    try:
        ray.get_actor(_ACTOR_NAME, namespace="ksql_ray").add.remote(kv)
    except Exception:
        pass  # diagnostics must never fail the stage


def collect_op_stats(reset: bool = True) -> dict:
    """Totals recorded since the last reset (call AFTER consuming the
    Dataset — stages run lazily)."""
    try:
        return ray.get(ensure_stats_actor().snapshot.remote(reset))
    except Exception:
        return {}
