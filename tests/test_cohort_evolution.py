"""Cohort LTV triangle and partition-evolution scan planning —
closed-form checks."""

import datetime

import pytest

from ferenda_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="tests-cohort-evolution", master="local[4]")
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_cohort_revenue_triangle(spark):
    """User 1 signs up in Jan, buys 10.00 in Jan and 5.50 in Mar;
    user 2 signs up in Feb, buys 2.25 in Feb."""
    from ferenda_spark.operators.events import cohort_revenue
    d = datetime.datetime
    ev = spark.createDataFrame(
        [(1, d(2024, 1, 5), 1, "view", 0.0),
         (2, d(2024, 1, 10), 1, "purchase", 10.0),
         (3, d(2024, 3, 1), 1, "purchase", 5.5),
         (4, d(2024, 2, 2), 2, "signup", 0.0),
         (5, d(2024, 2, 20), 2, "purchase", 2.25)],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    out = {(r.cohort_month, r.age_months): r for r in
           cohort_revenue(ev).collect()}
    assert out[("2024-01", 0)].revenue_cents == 1000
    assert out[("2024-01", 2)].revenue_cents == 550
    assert out[("2024-01", 2)].cum_revenue_cents == 1550
    assert out[("2024-02", 0)].revenue_cents == 225
    assert out[("2024-01", 0)].n_active_users == 1


def test_partition_evolution_mixed_specs(spark):
    """Rows at hours 980 (day spec, day 40), 1005 (hour spec):
    query [990, 1010) scans day 40 ([960, 984) misses) -> NOT
    scanned; day 41 ([984,1008)) overlaps; hour 1005 scanned;
    hour 1500 not."""
    from ferenda_spark.operators.store import partition_evolution_scan
    rows = spark.createDataFrame(
        [(980,), (990,), (1005,), (1500,)], "ts_hour long")
    out = {(r.spec, r.partition_key): r for r in
           partition_evolution_scan(rows, 1000, 990, 1010).collect()}
    assert not out[("day", 40)].scanned        # [960, 984)
    assert out[("day", 41)].scanned            # [984, 1008)
    assert out[("hour", 1005)].scanned
    assert not out[("hour", 1500)].scanned
    assert out[("day", 40)].lo_hour == 960
    assert out[("hour", 1005)].hi_hour == 1006
