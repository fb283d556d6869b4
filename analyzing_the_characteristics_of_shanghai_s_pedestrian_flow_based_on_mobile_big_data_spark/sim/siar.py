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

Two API layers:

- the single-band kernel (``siar_step``/``move``/``simulate``) — the
  compact teaching/CI shape;
- the reference-shaped banded layer: three age bands with per-band
  susceptibility (0.34 / 1 / 1.47 — ``Initial_Status``,
  1108Fit_para_multi.py:306-314) and a 3×3 cross-band contact matrix
  ``Mij3`` (``SIAR`` kernel :113-167), per-individual multinomial
  movement (``MultiNom2``/``Move5`` :186-217), the gamma-delayed
  confirmed-case curve (``Confirm_case`` :219-231, shape a=1.85,
  mean Td=6 days), and the RMSE fit against an observed daily
  confirmed series (``cal_para`` :336-341) driven through
  ``spark_param_sweep`` (:319-334's multiprocessing pool).

Every stochastic element takes ``rng=None`` → deterministic
expected-value dynamics, so calibration tests can recover planted
parameters exactly.
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


# ---------------------------------------------------------------------------
# Reference-shaped banded layer (three age classes + calibration)
# ---------------------------------------------------------------------------

#: The reference's per-band susceptibility multipliers
#: (Initial_Status, 1108Fit_para_multi.py:306-314).
DEFAULT_SUSC = np.array([0.34, 1.0, 1.47])


def siar_banded_step(
    states: np.ndarray,
    beta: float,
    gamma: float,
    mij: np.ndarray,
    susc: np.ndarray = DEFAULT_SUSC,
    alpha: float = 0.5,
    r: float = 0.6,
    dt: float = 1.0,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """One banded transition step (1108Fit_para_multi.py:113-167).

    ``states``: (B, M, 4) S/I/A/R counts per band per region;
    ``mij``: (B, B) cross-band contact matrix (the reference's Mij3);
    ``susc``: (B,) per-band susceptibility. Force of infection on band
    k in region m is susc_k·β·Σ_b mij[k,b]·(I_b + α·A_b)/NUM_b — the
    banded generalization of the single-class kernel. Returns
    (new_states, s2i) where s2i (B, M) is the new *symptomatic*
    infections (the reference's NI driving the confirmed-case curve).
    """
    st = states.astype(float)
    num = st.sum(axis=2)
    safe_num = np.where(num > 0, num, 1.0)
    inf = (st[:, :, I] + alpha * st[:, :, A]) / safe_num  # (B, M)
    force = mij @ inf  # (B, M): row k = Σ_b mij[k,b]·inf_b
    e_new = dt * beta * susc[:, None] * st[:, :, S] * force
    e_s2i = np.clip(r * e_new, 0, None)
    e_s2a = np.clip((1 - r) * e_new, 0, None)
    e_i2r = np.clip(dt * gamma * st[:, :, I], 0, None)
    e_a2r = np.clip(dt * gamma * st[:, :, A], 0, None)

    if rng is not None:
        s2i = rng.poisson(e_s2i).astype(float)
        s2a = rng.poisson(e_s2a).astype(float)
        i2r = np.minimum(rng.poisson(e_i2r).astype(float), st[:, :, I])
        a2r = np.minimum(rng.poisson(e_a2r).astype(float), st[:, :, A])
    else:
        s2i, s2a, i2r, a2r = e_s2i, e_s2a, e_i2r, e_a2r

    over = (s2i + s2a) > st[:, :, S]
    if over.any():
        scale = st[:, :, S][over] / np.maximum(
            s2i[over] + s2a[over], 1e-12
        )
        s2i[over] *= scale
        s2a[over] *= scale

    out = st.copy()
    out[:, :, S] -= s2i + s2a
    out[:, :, I] += s2i - i2r
    out[:, :, A] += s2a - a2r
    out[:, :, R] += i2r + a2r
    return out, s2i


def move_multinomial(
    x: np.ndarray, frac: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """Per-individual movement draw for one compartment vector
    (MultiNom2, 1108Fit_para_multi.py:186-204): each origin's count is
    distributed over destinations by a multinomial with pvals =
    frac[orig, :]; origins whose row has no mass keep their count."""
    out = np.zeros_like(x, dtype=float)
    for k in np.nonzero(x > 0)[0]:
        n_k = int(round(x[k]))
        if n_k <= 0:
            continue
        p = frac[k, :]
        nz = np.nonzero(p > 0)[0]
        if len(nz) > 1:
            out += rng.multinomial(n_k, p / p.sum())
        elif len(nz) == 1:
            out[nz[0]] += n_k
        else:
            out[k] += n_k
    return out


def move_banded(
    states: np.ndarray,
    frac: np.ndarray,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Redistribute every band/compartment along the OD fractions.
    ``rng=None``: expected-value fracᵀ·x (the reference's Move);
    otherwise per-individual multinomial draws (Move5/MultiNom2)."""
    if rng is None:
        return np.einsum("ij,bic->bjc", frac, states.astype(float))
    out = np.empty_like(states, dtype=float)
    for b in range(states.shape[0]):
        for c in range(states.shape[2]):
            out[b, :, c] = move_multinomial(states[b, :, c], frac, rng)
    return out


def _gamma_cdf(x: float, shape: float, scale: float) -> float:
    """Regularized lower incomplete gamma P(shape, x/scale) — series
    for small x, continued fraction otherwise (no scipy dependency)."""
    import math

    if x <= 0:
        return 0.0
    z = x / scale
    lg = math.lgamma(shape)
    if z < shape + 1.0:
        # series: P = z^a e^-z / Γ(a) Σ z^n Γ(a)/Γ(a+1+n)
        term = 1.0 / shape
        total = term
        a_n = shape
        for _ in range(200):
            a_n += 1.0
            term *= z / a_n
            total += term
            if abs(term) < abs(total) * 1e-12:
                break
        return total * math.exp(-z + shape * math.log(z) - lg)
    # continued fraction for Q, then P = 1 - Q (Lentz's algorithm)
    tiny = 1e-300
    b0 = z + 1.0 - shape
    c = 1.0 / tiny
    d = 1.0 / max(b0, tiny)
    h = d
    for i in range(1, 200):
        an = -i * (i - shape)
        b0 += 2.0
        d = an * d + b0
        d = 1.0 / max(abs(d), tiny) * (1 if d >= 0 else -1)
        c = b0 + an / c
        if abs(c) < tiny:
            c = tiny
        dl = d * c
        h *= dl
        if abs(dl - 1.0) < 1e-12:
            break
    q = math.exp(-z + shape * math.log(z) - lg) * h
    return 1.0 - q


def confirmation_curve(
    new_infections: np.ndarray,
    dt: float,
    days: int,
    shape: float = 1.85,
    mean_delay: float = 6.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Daily new-confirmed curve from per-step new infections
    (Confirm_case, 1108Fit_para_multi.py:219-231): each infection at
    step t confirms at day floor(t·dt + TD), TD ~ Gamma(a=1.85,
    scale=Td/a=6/1.85). ``rng=None`` spreads each step's count by the
    exact delay distribution instead of sampling — the expected value
    of the reference's draw."""
    out = np.zeros(days)
    scale = mean_delay / shape
    for t, n in enumerate(new_infections):
        if n <= 0:
            continue
        if rng is not None:
            for td in rng.gamma(shape, scale, size=int(round(n))):
                tx = int(t * dt + td)
                if tx < days:
                    out[tx] += 1
        else:
            t0 = t * dt
            for day in range(days):
                w = _gamma_cdf(day + 1 - t0, shape, scale) - _gamma_cdf(
                    day - t0, shape, scale
                )
                if w > 0:
                    out[day] += n * w
    return out


def simulate_banded(
    init: np.ndarray,
    hourly_fracs: Mapping[int, np.ndarray],
    n_steps: int,
    beta: float,
    gamma: float,
    mij: np.ndarray,
    susc: np.ndarray = DEFAULT_SUSC,
    alpha: float = 0.55,
    r: float = 0.6,
    dt: float = 1.0,
    cycle: int = 168,
    rng: np.random.Generator | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Banded alternating transition+movement over the weekly OD cycle
    (Result, 1108Fit_para_multi.py:233-297). Returns (trajectory
    (n_steps+1, B, M, 4), per-step total new symptomatic infections)."""
    st = init.astype(float)
    traj = [st]
    ni = np.zeros(n_steps)
    m_eye = np.eye(init.shape[1])
    for k in range(n_steps):
        st, s2i = siar_banded_step(
            st, beta, gamma, mij, susc, alpha, r, dt, rng
        )
        ni[k] = s2i.sum()
        st = move_banded(st, hourly_fracs.get(k % cycle, m_eye), rng)
        traj.append(st)
    return np.stack(traj), ni


def rmse_confirmed_loss(
    observed: np.ndarray,
    init: np.ndarray,
    hourly_fracs: Mapping[int, np.ndarray],
    n_steps: int,
    mij: np.ndarray,
    susc: np.ndarray = DEFAULT_SUSC,
    alpha: float = 0.55,
    r: float = 0.6,
    dt: float = 1.0,
    cycle: int = 168,
) -> Callable[[tuple], float]:
    """Loss factory for the parameter sweep (cal_para,
    1108Fit_para_multi.py:336-341): simulate with candidate (β, γ),
    turn new infections into a daily confirmed curve, return RMSE
    against the observed series. Deterministic (expected-value
    dynamics), so the sweep's argmin is reproducible."""
    days = len(observed)
    obs = np.asarray(observed, dtype=float)

    def loss(params: tuple) -> float:
        beta, gamma = params
        _, ni = simulate_banded(
            init, hourly_fracs, n_steps, beta, gamma, mij, susc, alpha, r, dt, cycle
        )
        pred = confirmation_curve(ni, dt, days)
        delta = obs - pred
        return float(np.sqrt(np.mean(delta * delta)))

    return loss


def fit_siar(
    spark,
    observed: np.ndarray,
    grid: Sequence[tuple],
    init: np.ndarray,
    hourly_fracs: Mapping[int, np.ndarray],
    n_steps: int,
    mij: np.ndarray,
    **kwargs,
) -> tuple[tuple, float, list[tuple[tuple, float]]]:
    """Reference fit loop (main + pool.apply_async,
    1108Fit_para_multi.py:319-334) on Spark: evaluate the RMSE loss for
    every (β, γ) on the grid in parallel, return (best_params,
    best_loss, all_results)."""
    loss = rmse_confirmed_loss(
        observed, init, hourly_fracs, n_steps, mij, **kwargs
    )
    results = spark_param_sweep(spark, grid, loss)
    best = min(results, key=lambda t: t[1])
    return best[0], best[1], results


def spark_param_sweep(
    spark,
    grid: Sequence[tuple],
    loss_fn: Callable[[tuple], float],
    broadcast_threshold: int = 64,
) -> list[tuple[tuple, float]]:
    """The reference's multiprocessing fit loop
    (1108Fit_para_multi.py:319-334) as a Spark job: one task per
    parameter combination, results collected to the driver.

    The loss closure captures the shared sim inputs (observed series,
    mobility matrix, hourly fractions — can be MBs). Past
    ``broadcast_threshold`` grid points, the closure is shipped via
    ``sc.broadcast`` so executors fetch it once instead of once per
    serialized task; below it, plain closure capture is cheaper (no
    broadcast-cleanup bookkeeping for a handful of tasks). Results are
    identical on both paths — only the transport changes.
    """
    sc = spark.sparkContext
    pts = list(grid)
    rdd = sc.parallelize(pts, numSlices=min(len(pts), 64))
    if len(pts) > broadcast_threshold:
        # sc.broadcast pickles with stdlib pickle, which rejects the
        # closures a loss_fn is in practice — ship cloudpickle bytes
        # (cloudpickle output loads with plain pickle.loads).
        import pickle

        from pyspark import cloudpickle

        bc = sc.broadcast(cloudpickle.dumps(loss_fn))

        def _run(part):
            fn = pickle.loads(bc.value)  # once per partition
            return ((p, float(fn(p))) for p in part)

        try:
            return rdd.mapPartitions(_run).collect()
        finally:
            bc.unpersist()
    return rdd.map(lambda p: (p, float(loss_fn(p)))).collect()
