"""SIAR simulation: conservation, epidemic dynamics, OD-fraction
plumbing from the engine's own od_fractions output, and the
Spark-distributed parameter sweep (X5)."""

from __future__ import annotations

import numpy as np

from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sim import (
    move,
    siar_step,
    simulate,
    spark_param_sweep,
)

INIT = np.array(
    [[990.0, 10.0, 0.0, 0.0], [1000.0, 0.0, 0.0, 0.0], [500.0, 0.0, 0.0, 0.0]]
)


def test_population_conserved_deterministic():
    frac = np.array([[0.8, 0.2, 0.0], [0.1, 0.8, 0.1], [0.0, 0.3, 0.7]])
    traj = simulate(INIT, {0: frac}, n_hours=48, beta=0.3, gamma=0.1, cycle=1)
    totals = traj.sum(axis=(1, 2))
    assert np.allclose(totals, totals[0])


def test_epidemic_grows_then_recovers():
    traj = simulate(INIT, {}, n_hours=300, beta=0.5, gamma=0.05, cycle=1)
    infected = traj[:, :, 1].sum(axis=1)
    assert infected.max() > infected[0] * 5  # outbreak
    # no mobility in this run → epidemic confined to seeded region 0;
    # most of that region ends recovered
    assert traj[-1, 0, 3] > 0.5 * traj[0, 0].sum()

def test_movement_spreads_to_connected_region():
    frac = np.array([[0.5, 0.5, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    traj = simulate(INIT, {0: frac}, n_hours=24, beta=0.4, gamma=0.1, cycle=1)
    assert traj[-1, 1, 1] > 0  # infection reached region 1 via mobility
    assert traj[-1, 2, 1] == 0  # region 2 is disconnected


def test_stochastic_mode_reproducible():
    rng1 = np.random.default_rng(42)
    rng2 = np.random.default_rng(42)
    a = simulate(INIT, {}, 24, beta=0.4, gamma=0.1, cycle=1, rng=rng1)
    b = simulate(INIT, {}, 24, beta=0.4, gamma=0.1, cycle=1, rng=rng2)
    assert np.array_equal(a, b)


def test_od_fractions_feed_move(spark):
    """Engine → sim plumbing: od_fractions long-form output densifies
    into a row-stochastic matrix that conserves mass under move()."""
    import pyspark.sql.functions as F

    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark import (
        operators as ops,
    )
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sources import (
        events_as_pings,
    )
    from conftest import SF_SMALL

    pos = ops.hourly_positions(events_as_pings(spark, SF_SMALL, 5))
    frac = ops.od_fractions(ops.od_matrix(ops.gap_fill_edges(pos)))
    one_hour = frac.filter(
        F.col("hour") == frac.select(F.min("hour")).collect()[0][0]
    ).collect()
    m = np.zeros((6, 6))
    for row in one_hour:
        m[row.orig, row.dest] = row.frac
    rows_with_mass = m.sum(axis=1) > 0
    assert rows_with_mass.any()
    assert np.allclose(m[rows_with_mass].sum(axis=1), 1.0)
    state = np.tile([100.0, 1.0, 0.0, 0.0], (6, 1))
    moved = move(state, m)
    # regions with outgoing mass conserve total population through move
    assert moved.sum() <= state.sum() + 1e-9


BANDED_INIT = np.stack(
    [
        np.array([[400.0, 2.0, 0.0, 0.0], [500.0, 0.0, 0.0, 0.0]]),
        np.array([[900.0, 5.0, 0.0, 0.0], [800.0, 0.0, 0.0, 0.0]]),
        np.array([[300.0, 1.0, 0.0, 0.0], [200.0, 0.0, 0.0, 0.0]]),
    ]
)
MIJ = np.array([[1.0, 0.5, 0.2], [0.5, 1.0, 0.5], [0.2, 0.5, 1.0]])
FRAC = np.array([[0.9, 0.1], [0.2, 0.8]])


def test_banded_population_conserved():
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sim import (
        simulate_banded,
    )

    traj, ni = simulate_banded(
        BANDED_INIT, {0: FRAC}, 48, beta=0.3, gamma=0.1, mij=MIJ, cycle=1
    )
    totals = traj.sum(axis=(1, 2, 3))
    assert np.allclose(totals, totals[0])
    assert (ni >= 0).all() and ni.sum() > 0


def test_banded_susceptibility_orders_attack_rates():
    """Higher-susceptibility bands accumulate proportionally more
    infections (susc 0.34 < 1 < 1.47, the reference's age classes)."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sim import (
        simulate_banded,
    )

    init = np.stack([np.array([[1000.0, 5.0, 0.0, 0.0]])] * 3)
    traj, _ = simulate_banded(init, {}, 200, beta=0.4, gamma=0.08, mij=MIJ, cycle=1)
    final_r = traj[-1, :, 0, 3]
    assert final_r[0] < final_r[1] < final_r[2]


def test_multinomial_move_conserves_and_matches_expectation():
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sim import (
        move_banded,
    )

    rng = np.random.default_rng(7)
    moved = move_banded(BANDED_INIT, FRAC, rng)
    assert moved.sum() == BANDED_INIT.sum()  # individuals, not mass, move
    expected = move_banded(BANDED_INIT, FRAC, None)
    # law of large numbers at these counts: within 15% where expectation is big
    big = expected > 50
    assert np.allclose(moved[big], expected[big], rtol=0.15)


def test_confirmation_curve_mass_and_delay():
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sim import (
        confirmation_curve,
    )

    ni = np.zeros(24)
    ni[0] = 1000.0  # one burst at t=0
    curve = confirmation_curve(ni, dt=1.0, days=60)
    assert abs(curve.sum() - 1000.0) < 1.0  # nearly all confirmed in 60 d
    mean_day = (np.arange(60) * curve).sum() / curve.sum()
    assert 5.0 < mean_day < 7.0  # Td = 6 days mean delay
    # sampled mode agrees in expectation
    sampled = confirmation_curve(ni, dt=1.0, days=60, rng=np.random.default_rng(3))
    assert abs(sampled.sum() - curve.sum()) < 50


def test_fit_recovers_planted_parameters(spark):
    """End-to-end calibration: synthesize a confirmed-case series from
    planted (beta, gamma), then the Spark-swept RMSE fit must pick the
    planted pair out of the grid (loss exactly 0 there — deterministic
    dynamics)."""
    from analyzing_the_characteristics_of_shanghai_s_pedestrian_flow_based_on_mobile_big_data_spark.sim import (
        confirmation_curve,
        fit_siar,
        simulate_banded,
    )

    beta0, gamma0 = 0.35, 0.12
    n_steps, days = 120, 10
    _, ni = simulate_banded(
        BANDED_INIT, {0: FRAC}, n_steps, beta=beta0, gamma=gamma0, mij=MIJ, cycle=1
    )
    observed = confirmation_curve(ni, dt=1.0, days=days)
    grid = [
        (b, g)
        for b in (0.2, 0.35, 0.5)
        for g in (0.05, 0.12, 0.3)
    ]
    best, best_loss, results = fit_siar(
        spark, observed, grid, BANDED_INIT, {0: FRAC}, n_steps, MIJ, cycle=1
    )
    assert len(results) == len(grid)
    assert best == (beta0, gamma0)
    assert best_loss < 1e-9


def test_spark_param_sweep(spark):
    target = 25.0

    def loss(p):
        beta, gamma = p
        traj = simulate(INIT, {}, 48, beta=beta, gamma=gamma, cycle=1)
        peak = traj[:, :, 1].sum(axis=1).max()
        return (peak - target) ** 2

    grid = [(b, g) for b in (0.1, 0.3, 0.5) for g in (0.05, 0.2)]
    results = spark_param_sweep(spark, grid, loss)
    assert len(results) == len(grid)
    best = min(results, key=lambda t: t[1])
    assert best[1] == min(l for _, l in results)


def test_spark_param_sweep_broadcast_path_identical(spark, monkeypatch):
    """Past the grid-size threshold the sweep ships the loss closure
    via ONE sc.broadcast (executors fetch the shared sim inputs once,
    not once per task); results are identical to the closure path."""
    calls = []
    sc = spark.sparkContext
    orig = sc.broadcast

    def counting_broadcast(v):
        calls.append(1)
        return orig(v)

    monkeypatch.setattr(sc, "broadcast", counting_broadcast)

    def loss(p):
        beta, gamma = p
        traj = simulate(INIT, {}, 24, beta=beta, gamma=gamma, cycle=1)
        return float(traj[:, :, 1].sum(axis=1).max())

    grid = [(b, g) for b in (0.1, 0.3, 0.5) for g in (0.05, 0.2)]

    plain = spark_param_sweep(spark, grid, loss, broadcast_threshold=1000)
    assert calls == []  # small grid: no broadcast machinery

    bcast = spark_param_sweep(spark, grid, loss, broadcast_threshold=0)
    assert calls == [1]  # big grid: exactly one broadcast
    assert sorted(bcast) == sorted(plain)
