"""SIAR metapopulation epidemic simulation — the downstream consumer of
the engine's OD-fraction / occupancy products (SURVEY.md X5).

The reference implements this in pure pandas/numpy with a
``multiprocessing`` parameter sweep (``1108Fit_para_multi.py``:
``SIAR`` transition kernel at :113-167, ``Move`` redistribution, sweep
at :319-334). Re-expressed here:

- the per-region transition kernel and movement step are vectorized
  numpy over a compact (M, 4) state — the sim itself is tiny (regions ×
  compartments), so it is *driver-side by design*; what must scale is
  producing its inputs (hour-keyed row-normalized OD fractions on a
  168-hour weekly cycle — the engine's ``od_weekly_cycle`` query);
- the reference's multiprocessing parameter sweep becomes
  ``spark_param_sweep``: ``spark.sparkContext.parallelize(grid).map``,
  the cluster-native version of the same embarrassing parallelism;
- the Poisson draws are optional (``rng=None`` → deterministic
  expected-value dynamics), so tests can pin conservation laws.

Differences from the reference, by design: one population class
instead of three age bands (the banding multiplies state columns, not
logic), and movement uses the expected-value redistribution
``fracᵀ·x`` rather than per-individual multinomial draws.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

import numpy as np

S, I, A, R = 0, 1, 2, 3


def siar_step(
    state: np.ndarray,
    beta: float,
    gamma: float,
    alpha: float = 0.5,
    r: float = 0.6,
    dt: float = 1.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """One transition step of the SIAR kernel (1108Fit_para_multi.py:113-167).

    ``state``: (M, 4) float array of S/I/A/R counts per region.
    New infections split r : (1-r) into symptomatic I / asymptomatic A,
    asymptomatic infectiousness discounted by ``alpha``; I and A recover
    at ``gamma``. ``rng`` switches on the reference's Poisson sampling.
    """
    st = state.astype(float)
    num = st.sum(axis=1)
    safe_num = np.where(num > 0, num, 1.0)
    force = (st[:, I] + alpha * st[:, A]) / safe_num
    e_new = dt * beta * st[:, S] * force
    e_s2i = np.clip(r * e_new, 0, None)
    e_s2a = np.clip((1 - r) * e_new, 0, None)
    e_i2r = np.clip(dt * gamma * st[:, I], 0, None)
    e_a2r = np.clip(dt * gamma * st[:, A], 0, None)

    if rng is not None:
        s2i = rng.poisson(e_s2i).astype(float)
        s2a = rng.poisson(e_s2a).astype(float)
        i2r = np.minimum(rng.poisson(e_i2r).astype(float), st[:, I])
        a2r = np.minimum(rng.poisson(e_a2r).astype(float), st[:, A])
    else:
        s2i, s2a, i2r, a2r = e_s2i, e_s2a, e_i2r, e_a2r

    # never draw more susceptibles than exist (reference :147-153)
    over = (s2i + s2a) > st[:, S]
    if over.any():
        scale = st[over, S] / np.maximum(s2i[over] + s2a[over], 1e-12)
        s2i[over] *= scale
        s2a[over] *= scale

    out = st.copy()
    out[:, S] -= s2i + s2a
    out[:, I] += s2i - i2r
    out[:, A] += s2a - a2r
    out[:, R] += i2r + a2r
    return out


def move(state: np.ndarray, frac: np.ndarray) -> np.ndarray:
    """Redistribute every compartment along the row-normalized OD
    fraction matrix (the reference's ``Move`` over hour-keyed
    ``mobility_frac`` matrices): new = fracᵀ · state."""
    return frac.T @ state


def simulate(
    init: np.ndarray,
    hourly_fracs: Mapping[int, np.ndarray],
    n_hours: int,
    beta: float,
    gamma: float,
    alpha: float = 0.5,
    r: float = 0.6,
    cycle: int = 168,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Run ``n_hours`` of alternating transition+movement, cycling the
    OD fractions weekly (keys[(k) % 168], 1108Fit_para_multi.py:247-248).
    Returns (n_hours+1, M, 4) trajectory."""
    traj = [init.astype(float)]
    st = init.astype(float)
    m = np.eye(init.shape[0])
    for k in range(n_hours):
        st = siar_step(st, beta, gamma, alpha, r, rng=rng)
        st = move(st, hourly_fracs.get(k % cycle, m))
        traj.append(st)
    return np.stack(traj)


def spark_param_sweep(
    spark,
    grid: Sequence[tuple],
    loss_fn: Callable[[tuple], float],
) -> list[tuple[tuple, float]]:
    """The reference's multiprocessing fit loop
    (1108Fit_para_multi.py:319-334) as a Spark job: one task per
    parameter combination, results collected to the driver. The
    closure ships the (small) inputs to executors once per task batch;
    for big grids broadcast the shared inputs instead."""
    sc = spark.sparkContext
    return (
        sc.parallelize(list(grid), numSlices=min(len(grid), 64))
        .map(lambda p: (p, float(loss_fn(p))))
        .collect()
    )
