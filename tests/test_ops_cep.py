"""CEP sequence-pattern matching (ops/cep.py) vs a per-key brute force.

The brute force walks each key's time-ordered rows with Python loops —
the semantics spec; the engine must reproduce it exactly in both
contiguity modes, with and without a ``within`` horizon.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from conftest import SF_DIR

from ksql_ray.expr import F
from ksql_ray.ops.cep import match_pattern

PAT = [("v", "view"), ("c", "click"), ("p", "purchase")]


def _events_df():
    df = pd.read_parquet(f"{SF_DIR}/events.parquet")
    return df.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)


def _brute(df, mode, within):
    rows = []
    for uid, g in df.groupby("user_id"):
        g = g.reset_index(drop=True)
        types = g["event_type"].values
        ts = g["ts"].values.astype("datetime64[us]").astype(np.int64)
        eids = g["event_id"].values
        n = len(g)
        for i in range(n):
            if types[i] != PAT[0][1]:
                continue
            chain = [i]
            ok = True
            for _, want in PAT[1:]:
                prev = chain[-1]
                if mode == "strict":
                    nxt = prev + 1
                    if nxt >= n or types[nxt] != want:
                        ok = False
                        break
                else:
                    nxt = next((x for x in range(prev + 1, n)
                                if types[x] == want), None)
                    if nxt is None:
                        ok = False
                        break
                chain.append(nxt)
            if not ok:
                continue
            if within is not None and ts[chain[-1]] - ts[chain[0]] > within:
                continue
            rows.append((uid, *(v for j in chain for v in (ts[j], eids[j]))))
    cols = ["user_id"] + [f"{s}_{c}" for s, _ in PAT
                          for c in ("ts", "event_id")]
    return pd.DataFrame(rows, columns=cols)


def _run(mode, within):
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    out = match_pattern(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[(s, F("event_type").Equal(t)) for s, t in PAT],
        contiguity=mode, within=within, tiebreak="event_id",
        measures=["event_id"], num_partitions=4)
    got = out.to_pandas()
    for s, _ in PAT:
        got[f"{s}_ts"] = got[f"{s}_ts"].astype(
            "datetime64[us]").astype(np.int64)
    return got


@pytest.mark.parametrize("mode", ["skip", "strict"])
@pytest.mark.parametrize("within", [None, 86_400_000_000])
def test_matches_brute_force(ray_session, mode, within):
    got = _run(mode, within)
    ref = _brute(_events_df(), mode, within)
    key = sorted(ref.columns)
    a = got[key].sort_values(key).reset_index(drop=True)
    b = ref[key].sort_values(key).reset_index(drop=True)
    assert len(a) > 0, "fixture produced no matches — test is vacuous"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_callable_predicate_and_no_match(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    out = match_pattern(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[("a", lambda t: np.asarray(
                    t.column("event_type").to_pandas() == "view")),
               ("z", lambda t: np.zeros(t.num_rows, dtype=bool))],
        contiguity="skip", num_partitions=4)
    assert out.count() == 0  # step z never matches -> empty, not an error


def test_validation_errors(ray_session):
    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    with pytest.raises(ValueError, match="at least 2"):
        match_pattern(ds, partition_by=["user_id"], order_by="ts",
                      steps=[("a", F("event_type").Equal("view"))])
    with pytest.raises(ValueError, match="contiguity"):
        match_pattern(ds, partition_by=["user_id"], order_by="ts",
                      contiguity="greedy",
                      steps=[("a", F("event_type").Equal("view")),
                             ("b", F("event_type").Equal("click"))])
    with pytest.raises(ValueError, match="duplicate step names"):
        match_pattern(ds, partition_by=["user_id"], order_by="ts",
                      steps=[("a", F("event_type").Equal("view")),
                             ("a", F("event_type").Equal("click"))])
    with pytest.raises(ValueError, match="unknown column"):
        match_pattern(ds, partition_by=["nope"], order_by="ts",
                      steps=[("a", F("event_type").Equal("view")),
                             ("b", F("event_type").Equal("click"))])


def test_two_step_strict_pairs(ray_session):
    """2-step strict == adjacent-row pairs; cross-checks the shifted-mask
    path with a second, independent pandas derivation."""
    df = _events_df()
    ds = ray.data.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = match_pattern(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[("e", F("event_type").Equal("error")),
               ("s", F("event_type").Equal("signup"))],
        contiguity="strict", tiebreak="event_id",
        measures=["event_id"], num_partitions=4).to_pandas()
    nxt_type = df.groupby("user_id")["event_type"].shift(-1)
    nxt_id = df.groupby("user_id")["event_id"].shift(-1)
    mask = (df["event_type"] == "error") & (nxt_type == "signup")
    assert sorted(out["e_event_id"]) == sorted(df.loc[mask, "event_id"])
    assert sorted(out["s_event_id"]) == sorted(nxt_id[mask].astype(int))


# ------------------------------------------------------------ funnel rates
def test_funnel_rates_brute_force(ray_session):
    from ksql_ray.expr import F
    from ksql_ray.ops.cep import funnel_rates

    # users: 1 completes v->c->p, 2 reaches v->c, 3 only v, 4 has c
    # without v (never enters the funnel)
    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2, 3, 4], pa.int64()),
        "et": pa.array(["v", "c", "p", "v", "c", "v", "c"]),
        "ts": pa.array([0, 1, 2, 0, 5, 9, 0], pa.timestamp("us")),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    out = funnel_rates(
        ray.data.from_arrow(t), partition_by=["u"], order_by="ts",
        steps=[("a", F("et").Equal("v")), ("b", F("et").Equal("c")),
               ("c", F("et").Equal("p"))], tiebreak="id")
    d = out.to_pydict()
    assert d["n_keys"] == [3, 2, 1]
    assert d["rate_from_first"] == [1.0, 2 / 3, 1 / 3]
    assert d["rate_from_prev"][1:] == [2 / 3, 1 / 2]


def test_funnel_rates_within_window(ray_session):
    from ksql_ray.expr import F
    from ksql_ray.ops.cep import funnel_rates

    # user 2's click is outside the 3us window
    t = pa.table({
        "u": pa.array([1, 1, 2, 2], pa.int64()),
        "et": pa.array(["v", "c", "v", "c"]),
        "ts": pa.array([0, 2, 0, 10], pa.timestamp("us")),
        "id": pa.array([1, 2, 3, 4], pa.int64()),
    })
    out = funnel_rates(
        ray.data.from_arrow(t), partition_by=["u"], order_by="ts",
        steps=[("a", F("et").Equal("v")), ("b", F("et").Equal("c"))],
        within=3, tiebreak="id").to_pydict()
    assert out["n_keys"] == [2, 1]
