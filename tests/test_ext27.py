"""Pins for the active-users / SPC wave (registry_ext27)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_active_users_identities(spark):
    """DAU <= WAU <= MAU every day; WAU(d) equals an independently
    computed exact distinct over the trailing 7 days for spot days;
    total days match the event span."""
    from stockify_spark.registry_ext27 import events_active_users
    from stockify_spark.registry import _t

    rows = {r.day: r for r in events_active_users(spark, SF_SMALL).collect()}
    assert rows
    for r in rows.values():
        assert r.dau <= r.wau <= r.mau
    ev = _t(spark, SF_SMALL, "events").select(
        (F.unix_millis(F.date_trunc("day", F.col("ts"))) / 86400000)
        .cast("long")
        .alias("day"),
        "user_id",
    )
    days = sorted(rows)
    for d in (days[0], days[len(days) // 2], days[-1]):
        exact7 = (
            ev.filter((F.col("day") >= d - 6) & (F.col("day") <= d))
            .select("user_id")
            .distinct()
            .count()
        )
        exact1 = (
            ev.filter(F.col("day") == d).select("user_id").distinct().count()
        )
        assert rows[d].wau == exact7, d
        assert rows[d].dau == exact1, d


def test_spc_sawtooth_structure(spark):
    """Closed form on the sawtooth: per-symbol sigma ~ 51.8 so no
    point reaches 2 or 3 sigma (rules 1 and 3 never fire), while the
    9-point below/above half-periods put EVERY point inside an
    8+ run (rule 2 fires everywhere) — the flagged set is all rows,
    rule2-only."""
    from stockify_spark.registry_ext27 import window_spc_control

    rows = window_spc_control(spark, SF_SMALL).collect()
    assert len(rows) == 1800
    for r in rows:
        assert r.rule2 is True
        assert r.rule1 is False
        assert r.rule3 is False
