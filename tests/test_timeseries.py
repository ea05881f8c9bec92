"""Pure-Python golden twins for the round-7c time-series keys: the SQL
oracles pin engine-vs-engine parity at sf0.01; these replay the exact
semantics sequentially over collected sf0.001 events, gating the
relational REFORMULATIONS (rescaled cumulative sum for the recursive
EWMA; +1/-1 sweep line for interval concurrency) against the definition
they claim to implement."""

from __future__ import annotations

from collections import defaultdict

import pytest

from spark_text_clustering_spark.catalog import load_table
from spark_text_clustering_spark.operators.analytics import (
    _EWMA_ALPHA,
    _SWEEP_WINDOW_MIN,
    concurrency_sweepline,
    timeseries_ewma,
)

from .conftest import SF_SMALL


def test_ewma_matches_sequential_recursion(spark):
    ev = sorted(
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value", "ts")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    want = {}
    state: dict = {}
    for r in ev:
        u = r["user_id"]
        if u not in state:
            state[u] = r["value"]
        else:
            state[u] = _EWMA_ALPHA * r["value"] + (1 - _EWMA_ALPHA) * state[u]
        want[r["event_id"]] = state[u]
    got = {r["event_id"]: r["ewma"] for r in timeseries_ewma(spark, SF_SMALL).collect()}
    assert set(got) == set(want)
    for eid, v in got.items():
        assert v == pytest.approx(want[eid], abs=2e-6), eid


def test_sweepline_matches_sequential_sweep(spark):
    ev = load_table(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    pts = defaultdict(list)
    for r in ev:
        key = (r["event_type"], r["ts"].date())
        end = r["ts"].timestamp() + _SWEEP_WINDOW_MIN * 60
        pts[key].append((r["ts"].timestamp(), 1))
        pts[key].append((end, -1))
    want = {}
    for key, ps in pts.items():
        c = mx = 0
        for _, delta in sorted(ps):  # (t, delta): -1 sorts before +1 on ties
            c += delta
            mx = max(mx, c)
        want[key] = mx
    got = {
        (r["event_type"], r["day"].date()): r["max_concurrent"]
        for r in concurrency_sweepline(spark, SF_SMALL).collect()
    }
    assert got == want
    assert all(v >= 1 for v in got.values())


def test_mad_outliers_match_pure_python(spark):
    """Golden twin at sf0.001: statistics.median uses the same
    mid-average interpolation as DuckDB median / Spark F.median, so
    the whole (med, mad, n_outliers) row must reproduce exactly."""
    import statistics

    from spark_text_clustering_spark.operators.analytics import (
        _MAD_CUTOFF,
        _MAD_SCALE,
        anomaly_mad_outliers,
    )

    ev = load_table(spark, SF_SMALL, "events").select("event_type", "value").collect()
    groups = defaultdict(list)
    for r in ev:
        groups[r["event_type"]].append(r["value"])
    want = {}
    for t, vals in groups.items():
        med = statistics.median(vals)
        mad = statistics.median(abs(v - med) for v in vals)
        n_out = sum(1 for v in vals if abs(v - med) > _MAD_CUTOFF * _MAD_SCALE * mad)
        want[t] = (round(med, 4), round(mad, 4), n_out)
    got = {
        r["event_type"]: (r["med"], r["mad"], r["n_outliers"])
        for r in anomaly_mad_outliers(spark, SF_SMALL).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][0] == pytest.approx(want[t][0], abs=1e-9)
        assert got[t][1] == pytest.approx(want[t][1], abs=1e-9)
        assert got[t][2] == want[t][2]


def test_exact_sweepline_matches_global_sequential_sweep(spark):
    """Golden twin for the cross-midnight-exact variant: one GLOBAL
    per-type timeline (no day chunks at all), tracking open count at
    every instant; per-day peak = max(open at day entry, open after
    each instant in the day). Must match exactly — carry seeding and
    eps-adjusted end days are the parts under test."""
    from collections import defaultdict as dd
    from datetime import timedelta

    from spark_text_clustering_spark.operators.analytics import (
        concurrency_sweepline_exact,
    )

    ev = load_table(spark, SF_SMALL, "events").select("event_type", "ts").collect()
    pts = dd(list)
    for r in ev:
        pts[r["event_type"]].append((r["ts"], 1))
        pts[r["event_type"]].append((r["ts"] + timedelta(minutes=_SWEEP_WINDOW_MIN), -1))
    want: dict = {}
    for typ, ps in pts.items():
        ps.sort()  # (t, delta): -1 before +1 on ties (half-open)
        count = 0
        day = None
        for t, delta in ps:
            d = t.date() if delta == 1 else (t - timedelta(microseconds=1)).date()
            if day is None or d > day:
                # entering a new day: seed its peak with the open count
                # carried across midnight (0 for the first day)
                day = d
                want[(typ, day)] = max(want.get((typ, day), 0), count)
            count += delta
            key = (typ, day)
            want[key] = max(want[key], count)
    got = {
        (r["event_type"], r["day"].date()): r["max_concurrent"]
        for r in concurrency_sweepline_exact(spark, SF_SMALL).collect()
    }
    assert got == want


def test_js_divergence_bounded_and_bin_aligned(spark):
    """JS's defining properties vs PSI: bounded by ln 2 (finite even on
    disjoint support), non-negative per the Jensen gap, and computed on
    the SAME 10 bins as drift_psi (bin-for-bin comparable counts)."""
    import math

    from spark_text_clustering_spark.operators.analytics import (
        drift_js_binned,
        drift_psi,
    )

    js = drift_js_binned(spark, SF_SMALL).collect()
    assert len(js) == 10
    total = sum(r["js_term"] for r in js)
    assert -1e-9 <= total <= math.log(2) + 1e-9
    assert all(r["js_term"] >= -1e-6 for r in js)  # per-bin Jensen gap
    psi_bins = {
        r["bin"]: (r["n_ref"], r["n_cur"]) for r in drift_psi(spark, SF_SMALL).collect()
    }
    js_bins = {r["bin"]: (r["n_ref"], r["n_cur"]) for r in js}
    assert js_bins == psi_bins


def test_categorical_entropy_matches_pure_python(spark):
    """Golden twin: Counter-based Shannon entropy / distinct / top
    share per column at sf0.001 must reproduce exactly."""
    import math
    from collections import Counter

    from spark_text_clustering_spark.operators.analytics import (
        profile_categorical_entropy,
    )

    docs = load_table(spark, SF_SMALL, "documents").select("lang", "source").collect()
    ev = load_table(spark, SF_SMALL, "events").select("event_type").collect()
    data = {
        "documents.lang": Counter(r["lang"] for r in docs if r["lang"] is not None),
        "documents.source": Counter(r["source"] for r in docs if r["source"] is not None),
        "events.event_type": Counter(
            r["event_type"] for r in ev if r["event_type"] is not None
        ),
    }
    got = {
        r["col_name"]: (r["n"], r["n_distinct"], r["entropy"], r["top_share"])
        for r in profile_categorical_entropy(spark, SF_SMALL).collect()
    }
    assert set(got) == set(data)
    for col, cnt in data.items():
        n = sum(cnt.values())
        ent = -sum((c / n) * math.log(c / n) for c in cnt.values())
        top = max(cnt.values()) / n
        gn, gd, ge, gt = got[col]
        assert gn == n and gd == len(cnt)
        assert ge == pytest.approx(round(ent, 6), abs=1e-9)
        assert gt == pytest.approx(round(top, 6), abs=1e-9)


def test_holt_matches_sequential_recursion(spark):
    """Golden twin: the textbook two-line Holt recursion evaluated
    sequentially in Python must reproduce the fold's (level, trend)
    per user (1e-6 — Python may fuse differently than the engines)."""
    from spark_text_clustering_spark.operators.analytics import (
        _HOLT_ALPHA,
        _HOLT_BETA,
        timeseries_holt_linear,
    )

    ev = sorted(
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "user_id", "value", "ts")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    state: dict = {}
    counts: dict = {}
    for r in ev:
        u = r["user_id"]
        x = float(r["value"])
        counts[u] = counts.get(u, 0) + 1
        if u not in state:
            state[u] = (x, 0.0)
            continue
        l_prev, b_prev = state[u]
        l_new = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (l_prev + b_prev)
        b_new = _HOLT_BETA * (l_new - l_prev) + (1 - _HOLT_BETA) * b_prev
        state[u] = (l_new, b_new)
    got = {
        r["user_id"]: (r["n_obs"], r["level"], r["trend"])
        for r in timeseries_holt_linear(spark, SF_SMALL).collect()
    }
    assert set(got) == set(state)
    for u, (l, b) in state.items():
        n, gl, gt = got[u]
        assert n == counts[u]
        assert gl == pytest.approx(l, abs=2e-6), u
        assert gt == pytest.approx(b, abs=2e-6), u


def test_chi2_matches_pure_python(spark):
    """Golden twin: textbook chi-square over the full r x c grid
    (zero cells contribute E) computed from Counters at sf0.001."""
    from collections import Counter

    from spark_text_clustering_spark.operators.analytics import (
        _CHI2_BUCKET_W,
        stats_chi2_independence,
    )

    ev = load_table(spark, SF_SMALL, "events").select("event_type", "value").collect()
    obs: Counter = Counter()
    for r in ev:
        if r["value"] is None:
            continue
        b = min(max(int(r["value"] // _CHI2_BUCKET_W), 0), 3)
        obs[(r["event_type"], b)] += 1
    n = sum(obs.values())
    rows = Counter()
    cols = Counter()
    for (t, b), o in obs.items():
        rows[t] += o
        cols[b] += o
    chi2 = 0.0
    for t in rows:
        for b in cols:
            e = rows[t] * cols[b] / n
            chi2 += (obs.get((t, b), 0) - e) ** 2 / e
    got = stats_chi2_independence(spark, SF_SMALL).collect()[0]
    assert got["n"] == n
    assert got["dof"] == (len(rows) - 1) * (len(cols) - 1)
    assert got["chi2"] == pytest.approx(chi2, abs=1e-5)


def test_equidepth_tiles_balanced_and_ordered(spark):
    """Equi-depth property: tile sizes differ by at most 1, bounds are
    non-overlapping and ordered, and the union covers all rows."""
    from spark_text_clustering_spark.operators.analytics import histogram_equidepth

    rows = sorted(
        histogram_equidepth(spark, SF_SMALL).collect(), key=lambda r: r["tile"]
    )
    assert [r["tile"] for r in rows] == list(range(1, 11))
    sizes = [r["n"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    total = load_table(spark, SF_SMALL, "events").where("value IS NOT NULL").count()
    assert sum(sizes) == total
    for a, b in zip(rows, rows[1:]):
        assert a["lo"] <= a["hi"] <= b["lo"] <= b["hi"]


def test_mannwhitney_identity_and_scipy_free_twin(spark):
    """U1 + U2 must equal n1*n2 (the rank-sum identity), and a pure-
    Python midrank computation reproduces both statistics exactly."""
    from collections import defaultdict as dd

    from spark_text_clustering_spark.operators.analytics import (
        _TT_A,
        _TT_B,
        stats_mannwhitney_u,
    )

    ev = [
        (r["event_type"], r["value"], r["event_id"])
        for r in load_table(spark, SF_SMALL, "events")
        .select("event_type", "value", "event_id")
        .collect()
        if r["value"] is not None and r["event_type"] in (_TT_A, _TT_B)
    ]
    ev.sort(key=lambda e: (e[1], e[2]))
    groups = dd(list)
    for pos, (t, x, _) in enumerate(ev, start=1):
        groups[x].append((t, pos))
    r = {_TT_A: 0.0, _TT_B: 0.0}
    n = {_TT_A: 0, _TT_B: 0}
    for x, members in groups.items():
        mid = sum(p for _, p in members) / len(members)
        for t, _ in members:
            r[t] += mid
            n[t] += 1
    u1 = r[_TT_A] - n[_TT_A] * (n[_TT_A] + 1) / 2
    u2 = r[_TT_B] - n[_TT_B] * (n[_TT_B] + 1) / 2
    got = stats_mannwhitney_u(spark, SF_SMALL).collect()[0]
    assert got["n1"] == n[_TT_A] and got["n2"] == n[_TT_B]
    assert got["u1"] == pytest.approx(u1, abs=1e-6)
    assert got["u2"] == pytest.approx(u2, abs=1e-6)
    assert got["u1"] + got["u2"] == pytest.approx(got["n1"] * got["n2"], abs=1e-6)


def test_welch_matches_pure_python(spark):
    import statistics

    from spark_text_clustering_spark.operators.analytics import (
        _TT_A,
        _TT_B,
        stats_ttest_welch,
    )

    vals = dd = {_TT_A: [], _TT_B: []}
    for r in (
        load_table(spark, SF_SMALL, "events").select("event_type", "value").collect()
    ):
        if r["value"] is not None and r["event_type"] in vals:
            vals[r["event_type"]].append(r["value"])
    m1, m2 = statistics.fmean(vals[_TT_A]), statistics.fmean(vals[_TT_B])
    v1, v2 = statistics.variance(vals[_TT_A]), statistics.variance(vals[_TT_B])
    n1, n2 = len(vals[_TT_A]), len(vals[_TT_B])
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / se2**0.5
    dof = se2**2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))
    got = stats_ttest_welch(spark, SF_SMALL).collect()[0]
    assert got["n1"] == n1 and got["n2"] == n2
    assert got["t_stat"] == pytest.approx(t, abs=1e-5)
    assert got["dof"] == pytest.approx(dof, abs=1e-4)
