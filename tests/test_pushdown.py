"""WHERE pushdown (exec/pushdown.py): translated filters select a
superset (never a subset), end results stay bit-identical with the
pushdown active, EXPLAIN reports the pushed count, and untranslatable
shapes are left alone."""

import pyarrow as pa
import pytest

from ksql_ray import Engine, F, Literal, Schema, Select
from ksql_ray import testdata_catalog as _testdata_catalog
from ksql_ray.exec.pushdown import to_scanner_filter
from ksql_ray.expr import And, Not, Or

from conftest import SF_DIR


@pytest.fixture(scope="module")
def eng():
    return Engine(_testdata_catalog(SF_DIR))


NAMES = ["event_id", "ts", "user_id", "event_type", "value", "props"]


def test_translates_sargable_shapes():
    conds = [
        F("value").Greater(50),
        F("event_type").Equal("view"),
        F("user_id").In(1, 2, 3),
        F("props").IsNotNull(),
        Or(F("value").Less(10), F("event_type").Equal("error")),
        Not(F("event_type").Equal("signup")),
    ]
    expr, pushed = to_scanner_filter(conds, NAMES)
    assert pushed == 6 and expr is not None


def test_untranslatable_stays_in_memory():
    from ksql_ray.expr import Add

    conds = [
        Add(F("value"), Literal(1)).Greater(10),       # arithmetic
        F("user_id").NotIn(1, 2),                      # 3-valued NOT IN
        F("nope").Equal(1),                            # unknown column
    ]
    expr, pushed = to_scanner_filter(conds, NAMES)
    assert pushed == 0 and expr is None


def test_and_drops_conjunct_conservatively():
    from ksql_ray.expr import Add

    conds = [And(F("value").Greater(50),
                 Add(F("value"), Literal(1)).Greater(10))]
    expr, pushed = to_scanner_filter(conds, NAMES)
    assert pushed == 1 and expr is not None         # superset of the AND
    # but OR with an untranslatable branch must NOT push
    conds = [Or(F("value").Greater(50),
                Add(F("value"), Literal(1)).Greater(10))]
    expr, pushed = to_scanner_filter(conds, NAMES)
    assert pushed == 0 and expr is None


def _q():
    return (Select(F("event_id"), F("user_id"), F("value"))
            .From(Schema("events"))
            .Where(F("value").Greater(100),
                   F("event_type").In("view", "click"),
                   F("props").IsNotNull()))


def test_pushdown_results_identical(eng):
    """The scanner filter is active on this query (join-free, sargable)
    and the result equals the same query with pushdown disabled."""
    import ksql_ray.exec.pushdown as pd_mod

    with_push = eng.table(_q())
    orig = pd_mod.to_scanner_filter
    try:
        pd_mod.to_scanner_filter = lambda conds, names: (None, 0)
        without = eng.table(_q())
    finally:
        pd_mod.to_scanner_filter = orig
    key = lambda t: sorted(map(tuple, t.to_pydict().values()))
    a = sorted(zip(*with_push.to_pydict().values()))
    b = sorted(zip(*without.to_pydict().values()))
    assert a == b and len(a) > 0


def test_explain_reports_pushed(eng):
    plan = eng.explain(_q())
    assert "3 pushed to the Parquet scanner" in plan
