"""Pin the single-pass funnel (ops/cep.py funnel_rates, one key
exchange) against the independent n-pass reference
(funnel_rates_multipass: one match_pattern run per prefix) on a
randomized corpus — VERDICT r4 item #2's required equivalence test.

The randomized corpus plants NULL timestamps (step-1-only keys), ties
broken by event_id, hot keys, and keys stalling at every depth, in
both contiguity modes and with/without a ``within`` horizon.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from conftest import SF_DIR

from ksql_ray.expr import F
from ksql_ray.ops.cep import funnel_rates, funnel_rates_multipass

STEPS = [("v", F("event_type").Equal("view")),
         ("c", F("event_type").Equal("click")),
         ("p", F("event_type").Equal("purchase")),
         ("r", F("event_type").Equal("refund"))]


def _random_events(seed: int, n: int = 4000, keys: int = 300) -> pa.Table:
    rng = np.random.default_rng(seed)
    uid = rng.integers(0, keys, size=n)
    uid[: n // 10] = 7  # hot key: ~10% of all rows
    types = rng.choice(
        ["view", "click", "purchase", "refund", "other"],
        size=n, p=[0.35, 0.25, 0.15, 0.05, 0.20])
    ts = rng.integers(0, 3_600_000_000, size=n).astype("datetime64[us]")
    ts_null = rng.random(n) < 0.03  # NULL-ts rows: step-1-only anchors
    return pa.table({
        "user_id": pa.array(uid, type=pa.int64()),
        "event_type": pa.array(types, type=pa.string()),
        "ts": pa.array(pd.Series(ts).mask(ts_null)),
        "event_id": pa.array(np.arange(n), type=pa.int64()),
    })


@pytest.mark.parametrize("mode", ["skip", "strict"])
@pytest.mark.parametrize("within", [None, 600_000_000])
@pytest.mark.parametrize("seed", [1, 2])
def test_single_pass_equals_multipass_random(ray_session, mode, within,
                                             seed):
    tbl = _random_events(seed)
    kw = dict(partition_by=["user_id"], order_by="ts", steps=STEPS,
              contiguity=mode, within=within, tiebreak="event_id",
              num_partitions=4)
    one = funnel_rates(ray.data.from_arrow(tbl), **kw).to_pandas()
    many = funnel_rates_multipass(ray.data.from_arrow(tbl),
                                  **kw).to_pandas()
    assert one["n_keys"].iloc[0] > 0, "vacuous corpus"
    pd.testing.assert_frame_equal(one, many)


def test_single_pass_equals_multipass_fixture(ray_session):
    kw = dict(partition_by=["user_id"], order_by="ts", steps=STEPS[:3],
              contiguity="skip", within=86_400_000_000,
              tiebreak="event_id", num_partitions=4)
    one = funnel_rates(
        ray.data.read_parquet(f"{SF_DIR}/events.parquet"), **kw).to_pandas()
    many = funnel_rates_multipass(
        ray.data.read_parquet(f"{SF_DIR}/events.parquet"), **kw).to_pandas()
    assert one["n_keys"].iloc[0] > 0
    pd.testing.assert_frame_equal(one, many)


def test_multikey_partition(ray_session):
    # compound partition keys exercise the mixed-radix gid path
    tbl = _random_events(3, n=1500, keys=40)
    tbl = tbl.append_column(
        "region", pa.array((np.arange(tbl.num_rows) % 3), type=pa.int64()))
    kw = dict(partition_by=["region", "user_id"], order_by="ts",
              steps=STEPS[:3], contiguity="skip", within=900_000_000,
              tiebreak="event_id", num_partitions=4)
    one = funnel_rates(ray.data.from_arrow(tbl), **kw).to_pandas()
    many = funnel_rates_multipass(ray.data.from_arrow(tbl),
                                  **kw).to_pandas()
    pd.testing.assert_frame_equal(one, many)
