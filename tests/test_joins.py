"""Join conformance vs DuckDB (reference surface: ksql/join.go:28-34,
join_test.go:22-100, multi-join chains select_builder_test.go:108,173)."""

import pytest

from ksql_ray import And, Count, Engine, F, Or, Schema, Select, Sum

from conftest import assert_tables_equal


def check(engine, duck, builder, sql, **kw):
    actual = engine.table(builder)
    expected = duck.execute(sql).arrow()
    assert_tables_equal(actual, expected, **kw)


@pytest.fixture(scope="module")
def shuffle_engine(catalog):
    # force the shuffle-join path (no broadcast)
    return Engine(catalog, num_partitions=4, broadcast_max_bytes=0)


def test_inner_join_broadcast(engine, duck):
    q = (
        Select(F("o_orderkey"), F("c_name"), F("o_totalprice"))
        .From(Schema("orders"))
        .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
        .Where(F("o_totalprice").Greater(300000.0))
    )
    check(engine, duck, q,
          "SELECT o_orderkey, c_name, o_totalprice FROM orders "
          "JOIN customer ON o_custkey = c_custkey WHERE o_totalprice > 300000.0")


def test_inner_join_shuffle(shuffle_engine, duck):
    q = (
        Select(F("o_orderkey"), F("c_name"), F("o_totalprice"))
        .From(Schema("orders"))
        .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
        .Where(F("o_totalprice").Greater(300000.0))
    )
    check(shuffle_engine, duck, q,
          "SELECT o_orderkey, c_name, o_totalprice FROM orders "
          "JOIN customer ON o_custkey = c_custkey WHERE o_totalprice > 300000.0")


def test_left_join(engine, duck):
    # supplier has only 10 rows; join customers on nationkey -> some unmatched
    q = (
        Select(F("c_custkey"), F("s_name"))
        .From(Schema("customer"))
        .LeftJoin(Schema("supplier"), F("customer.c_nationkey").Equal(F("supplier.s_nationkey")))
    )
    check(engine, duck, q,
          "SELECT c_custkey, s_name FROM customer "
          "LEFT JOIN supplier ON c_nationkey = s_nationkey")


def test_right_join(shuffle_engine, duck):
    q = (
        Select(F("c_custkey"), F("s_name"))
        .From(Schema("supplier"))
        .RightJoin(Schema("customer"), F("supplier.s_nationkey").Equal(F("customer.c_nationkey")))
    )
    check(shuffle_engine, duck, q,
          "SELECT c_custkey, s_name FROM supplier "
          "RIGHT JOIN customer ON s_nationkey = c_nationkey")


def test_outer_join(shuffle_engine, duck):
    q = (
        Select(F("s_suppkey"), F("n_name"))
        .From(Schema("supplier"))
        .OuterJoin(Schema("nation"), F("supplier.s_nationkey").Equal(F("nation.n_nationkey")))
    )
    check(shuffle_engine, duck, q,
          "SELECT s_suppkey, n_name FROM supplier "
          "FULL OUTER JOIN nation ON s_nationkey = n_nationkey")


def test_cross_join(engine, duck):
    q = (
        Select(F("r_name"), F("n_name"))
        .From(Schema("region"))
        .CrossJoin(Schema("nation"))
    )
    check(engine, duck, q, "SELECT r_name, n_name FROM region CROSS JOIN nation")


def test_multi_join_chain(engine, duck):
    q = (
        Select(F("l_orderkey"), F("c_name"), F("n_name"))
        .From(Schema("lineitem"))
        .Join(Schema("orders"), F("lineitem.l_orderkey").Equal(F("orders.o_orderkey")))
        .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
        .Join(Schema("nation"), F("customer.c_nationkey").Equal(F("nation.n_nationkey")))
        .Where(F("l_quantity").Greater(49))
    )
    check(engine, duck, q,
          "SELECT l_orderkey, c_name, n_name FROM lineitem "
          "JOIN orders ON l_orderkey = o_orderkey "
          "JOIN customer ON o_custkey = c_custkey "
          "JOIN nation ON c_nationkey = n_nationkey WHERE l_quantity > 49")


def test_join_then_aggregate(engine, duck):
    q = (
        Select(F("n_name"), Sum(F("o_totalprice")).As("total"),
               Count(F("o_orderkey")).As("cnt"))
        .From(Schema("orders"))
        .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
        .Join(Schema("nation"), F("customer.c_nationkey").Equal(F("nation.n_nationkey")))
        .GroupBy(F("n_name"))
    )
    check(engine, duck, q,
          "SELECT n_name, sum(o_totalprice) AS total, count(o_orderkey) AS cnt "
          "FROM orders JOIN customer ON o_custkey = c_custkey "
          "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name")


def test_join_compound_on_condition(engine, duck):
    # compound AND ON-conditions (join_test.go:81,100)
    q = (
        Select(F("o_orderkey"), F("c_name"))
        .From(Schema("orders"))
        .Join(
            Schema("customer"),
            And(
                F("orders.o_custkey").Equal(F("customer.c_custkey")),
                F("customer.c_acctbal").Greater(0.0),
            ),
        )
    )
    check(engine, duck, q,
          "SELECT o_orderkey, c_name FROM orders "
          "JOIN customer ON o_custkey = c_custkey AND c_acctbal > 0.0")


def test_left_join_with_residual(engine, duck):
    q = (
        Select(F("c_custkey"), F("s_name"))
        .From(Schema("customer"))
        .LeftJoin(
            Schema("supplier"),
            And(
                F("customer.c_nationkey").Equal(F("supplier.s_nationkey")),
                F("supplier.s_acctbal").Greater(5000.0),
            ),
        )
    )
    check(engine, duck, q,
          "SELECT c_custkey, s_name FROM customer "
          "LEFT JOIN supplier ON c_nationkey = s_nationkey AND s_acctbal > 5000.0")


def test_cte(engine, duck):
    from ksql_ray import Schema as S

    inner = (
        Select(F("o_custkey"), Sum(F("o_totalprice")).As("spend"))
        .From(S("orders"))
        .GroupBy(F("o_custkey"))
        .As("spend_by_cust")
    )
    outer = (
        Select(F("o_custkey"), F("spend"))
        .From(S("spend_by_cust"))
        .Where(F("spend").Greater(1000000.0))
        .WithCTE(inner)
    )
    check(engine, duck, outer,
          "WITH spend_by_cust AS (SELECT o_custkey, sum(o_totalprice) AS spend "
          "FROM orders GROUP BY o_custkey) "
          "SELECT o_custkey, spend FROM spend_by_cust WHERE spend > 1000000.0")


def test_right_join_with_residual(shuffle_engine, duck):
    # compound ON for RIGHT joins (reference ksql/join.go:61-103): right
    # rows whose matches all fail the residual are null-padded once
    q = (
        Select(F("c_custkey"), F("s_name"))
        .From(Schema("supplier"))
        .RightJoin(
            Schema("customer"),
            And(
                F("supplier.s_nationkey").Equal(F("customer.c_nationkey")),
                F("supplier.s_acctbal").Greater(5000.0),
            ),
        )
    )
    check(shuffle_engine, duck, q,
          "SELECT c_custkey, s_name FROM supplier "
          "RIGHT JOIN customer ON s_nationkey = c_nationkey AND s_acctbal > 5000.0")


def test_outer_join_with_residual(shuffle_engine, duck):
    q = (
        Select(F("s_suppkey"), F("n_name"))
        .From(Schema("supplier"))
        .OuterJoin(
            Schema("nation"),
            And(
                F("supplier.s_nationkey").Equal(F("nation.n_nationkey")),
                F("supplier.s_acctbal").Greater(5000.0),
            ),
        )
    )
    check(shuffle_engine, duck, q,
          "SELECT s_suppkey, n_name FROM supplier "
          "FULL OUTER JOIN nation ON s_nationkey = n_nationkey AND s_acctbal > 5000.0")


def test_left_join_with_residual_shuffle(shuffle_engine, duck):
    # the same compound-ON LEFT join through the co-partitioned path
    q = (
        Select(F("c_custkey"), F("s_name"))
        .From(Schema("customer"))
        .LeftJoin(
            Schema("supplier"),
            And(
                F("customer.c_nationkey").Equal(F("supplier.s_nationkey")),
                F("supplier.s_acctbal").Greater(5000.0),
            ),
        )
    )
    check(shuffle_engine, duck, q,
          "SELECT c_custkey, s_name FROM customer "
          "LEFT JOIN supplier ON c_nationkey = s_nationkey AND s_acctbal > 5000.0")
