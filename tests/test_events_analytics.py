"""events_analytics: semantic fixtures (oracle parity lives in
test_oracle_parity / the driver)."""

import datetime

from biomedical_entity_linking_spark.operators import events_analytics as EA

T0 = datetime.datetime(2024, 3, 1, 9, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )


def _write(spark, tmp_path, rows):
    p = str(tmp_path / "events.parquet")
    _events(spark, rows).write.parquet(p)
    return str(tmp_path)


def test_sessions_split_exactly_at_gap(spark, tmp_path):
    m = datetime.timedelta(minutes=1)
    rows = [
        (1, T0, 1, "view", 1.0, "{}"),
        (2, T0 + 29 * m, 1, "click", 2.0, "{}"),     # same session (< 30m)
        (3, T0 + 60 * m, 1, "view", 4.0, "{}"),      # 31m gap → new session
        (4, T0, 2, "view", 8.0, "{}"),               # other user isolated
    ]
    sf = _write(spark, tmp_path, rows)
    out = EA.event_sessions(spark, sf).collect()
    got = {(r.user_id, r.session_idx): r for r in out}
    assert set(got) == {(1, 1), (1, 2), (2, 1)}
    assert got[(1, 1)].n_events == 2 and got[(1, 1)].total_value == 3.0
    assert got[(1, 2)].n_events == 1
    assert got[(1, 1)].dur_us == 29 * 60 * 1_000_000


def test_funnel_requires_strict_order(spark, tmp_path):
    m = datetime.timedelta(minutes=1)
    rows = [
        # user 1: full ordered funnel
        (1, T0, 1, "view", 0.0, "{}"),
        (2, T0 + m, 1, "click", 0.0, "{}"),
        (3, T0 + 2 * m, 1, "purchase", 9.0, "{}"),
        # user 2: click BEFORE first view — click must not count
        (4, T0, 2, "click", 0.0, "{}"),
        (5, T0 + m, 2, "view", 0.0, "{}"),
        (6, T0 + 2 * m, 2, "purchase", 9.0, "{}"),  # no qualifying click
        # user 3: never views
        (7, T0, 3, "purchase", 9.0, "{}"),
    ]
    sf = _write(spark, tmp_path, rows)
    r = EA.funnel_conversion(spark, sf).collect()[0]
    assert r.n_users == 3
    assert r.n_viewed == 2
    assert r.n_clicked_after_view == 1   # only user 1
    assert r.n_purchased_after_click == 1
    assert r.view_to_click_ppm == 500_000


def test_retention_cohort_offsets(spark, tmp_path):
    wk = datetime.timedelta(weeks=1)
    rows = [
        (1, T0, 1, "view", 0.0, "{}"),          # cohort W
        (2, T0 + 2 * wk, 1, "view", 0.0, "{}"),  # offset 2
        (3, T0 + wk, 2, "view", 0.0, "{}"),      # cohort W+1
    ]
    sf = _write(spark, tmp_path, rows)
    out = {(r.cohort_week, r.week_offset): r.n_users
           for r in EA.retention_cohorts(spark, sf).collect()}
    weeks = sorted({cw for cw, _ in out})
    w0 = weeks[0]
    assert out[(w0, 0)] == 1 and out[(w0, 2)] == 1
    assert out[(w0 + 1, 0)] == 1
    assert (w0, 1) not in out
