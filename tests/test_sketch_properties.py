"""Property tests for the sketch suite's GUARANTEES (not just examples):
QuantileSketch's accumulated rank-error bound holds for every quantile
under arbitrary insert/merge schedules; Misra-Gries never overcounts
and honors its undercount bound; HLL registers are insert-order- and
duplication-invariant. Pure library level — no Ray session needed."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ksql_ray.ops.hll import registers_from_keys
from ksql_ray.ops.quantiles import QuantileSketch

SET = dict(deadline=None, max_examples=40,
           suppress_health_check=[HealthCheck.too_slow])


@given(
    chunks=st.lists(
        st.lists(st.floats(min_value=-1e6, max_value=1e6,
                           allow_nan=False), min_size=0, max_size=200),
        min_size=1, max_size=8),
    capacity=st.sampled_from([4, 8, 16, 64]),
    split=st.integers(min_value=0, max_value=8),
)
@settings(**SET)
def test_quantile_rank_bound_invariant(chunks, capacity, split):
    """For every q: the returned value's true-rank window overlaps
    [target − err, target + err), whatever the insert/merge schedule."""
    split = min(split, len(chunks))
    a = QuantileSketch(capacity)
    b = QuantileSketch(capacity)
    for i, ch in enumerate(chunks):
        (a if i < split else b).insert(np.array(ch, dtype=np.float64))
    a.merge(b)
    allv = np.sort(np.concatenate(
        [np.array(c, dtype=np.float64) for c in chunks]))
    if len(allv) == 0:
        return
    assert a.n == len(allv)
    for q in (0.0, 0.1, 0.5, 0.9, 1.0):
        v = a.quantile(q)
        target = max(1, int(np.ceil(q * len(allv) - 1e-9)))
        at_or_below = int(np.searchsorted(allv, v, side="right"))
        below = int(np.searchsorted(allv, v, side="left"))
        assert at_or_below >= target - a.max_rank_error
        assert below < target + a.max_rank_error + 1
        # exactness promise: zero bound => exactly quantile_disc
        if a.max_rank_error == 0:
            assert v == allv[target - 1]


def _mg_reference(stream):
    from collections import Counter

    return Counter(stream)


@given(
    stream=st.lists(st.integers(min_value=0, max_value=30),
                    min_size=1, max_size=600),
    capacity=st.sampled_from([2, 4, 8]),
    n_epochs=st.integers(min_value=1, max_value=5),
)
@settings(**SET)
def test_misra_gries_bounds(stream, capacity, n_epochs):
    """Single-partition MG semantics (mirrors TopKStateActor.process's
    merge/decrement): counts never exceed truth; undercount <= reported
    bound; every key with true count > bound survives."""
    import pandas as pd

    state = pd.Series(dtype=np.int64)
    undercount = 0
    per = max(1, len(stream) // n_epochs)
    for i in range(0, len(stream), per):
        chunk = stream[i:i + per]
        inc = pd.Series(chunk).value_counts()
        inc.index = inc.index.map(str)
        state = state.add(inc, fill_value=0).astype(np.int64)
        if len(state) > capacity:
            v = np.partition(state.to_numpy(), len(state) - capacity - 1)
            d = int(v[len(state) - capacity - 1])
            state = state[state > d] - d
            undercount += d
    truth = _mg_reference([str(x) for x in stream])
    assert len(state) <= capacity
    for k, c in state.items():
        assert c <= truth[k]
        assert truth[k] - c <= undercount
    for k, c in truth.items():
        if c > undercount:
            assert k in state.index


@given(
    keys=st.lists(st.text(min_size=1, max_size=6), min_size=1,
                  max_size=300),
    p=st.sampled_from([4, 6, 8]),
)
@settings(**SET)
def test_hll_registers_order_and_dup_invariant(keys, p):
    ka = np.array(keys, dtype=object)
    r1, h1 = registers_from_keys(ka, p, "fast")
    # shuffled + duplicated input -> identical register maxima
    rng = np.random.default_rng(0)
    idx = rng.permutation(np.arange(len(ka)))
    kb = np.concatenate([ka[idx], ka])
    r2, h2 = registers_from_keys(kb, p, "fast")
    m = 1 << p
    best1 = np.zeros(m, np.int64)
    np.maximum.at(best1, r1, h1)
    best2 = np.zeros(m, np.int64)
    np.maximum.at(best2, r2, h2)
    assert np.array_equal(best1, best2)
