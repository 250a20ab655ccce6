"""Scheduler math golden/invariant tests (reference: models/infer.py:39-40,98-119)."""

import jax.numpy as jnp
import numpy as np

from photoverse_tpu.core import DDPMSchedule, DPMSolverMultistep, make_sd15_schedule


def test_sd15_schedule_known_values():
    sch = make_sd15_schedule()
    # endpoints of the SD-1.5 scaled_linear schedule
    assert abs(sch.alphas_cumprod[0] - (1 - 0.00085)) < 1e-9
    assert 0.004 < sch.alphas_cumprod[-1] < 0.005
    assert np.all(np.diff(sch.alphas_cumprod) < 0)


def test_ddpm_add_noise_formula():
    sch = make_sd15_schedule()
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    eps = jnp.asarray(rng.randn(2, 4, 8, 8).astype(np.float32))
    t = jnp.asarray([0, 999])
    noisy = sch.add_noise(x, eps, t)
    a0 = np.sqrt(sch.alphas_cumprod[0])
    s0 = np.sqrt(1 - sch.alphas_cumprod[0])
    np.testing.assert_allclose(
        np.asarray(noisy[0]), a0 * np.asarray(x[0]) + s0 * np.asarray(eps[0]), rtol=1e-5
    )
    a1 = np.sqrt(sch.alphas_cumprod[999])
    s1 = np.sqrt(1 - sch.alphas_cumprod[999])
    np.testing.assert_allclose(
        np.asarray(noisy[1]), a1 * np.asarray(x[1]) + s1 * np.asarray(eps[1]), rtol=1e-5
    )


def test_dpm_timestep_grid_linspace():
    sch = make_sd15_schedule()
    solver = DPMSolverMultistep.create(sch, 25)
    expected = np.linspace(0, 999, 26).round()[::-1][:-1].astype(np.int64)
    np.testing.assert_array_equal(solver.timesteps, expected)
    assert solver.sigmas[-1] == 0.0
    assert solver.num_steps == 25


def test_dpm_solver_exact_for_consistent_model():
    """If the model's eps is consistent with a fixed x0, the solver recovers
    x0 exactly at every step (the update is the exact ODE solution then)."""
    sch = make_sd15_schedule()
    for n in (5, 10, 25, 50):
        solver = DPMSolverMultistep.create(sch, n)
        rng = np.random.RandomState(1)
        x0_true = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        noise = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
        sigma0 = solver.sigmas[0]
        alpha0 = 1.0 / np.sqrt(sigma0**2 + 1)
        x = alpha0 * x0_true + sigma0 * alpha0 * noise

        xs = solver.scan_inputs()
        m_prev = jnp.zeros_like(x)
        for i in range(n):
            step = {k: v[i] for k, v in xs.items()}
            # eps consistent with x0_true at the current sigma
            eps = (x - x0_true / step["x0_scale"]) / step["eps_coef"]
            x, m_prev = solver.step(step, x, eps, m_prev)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), rtol=2e-4, atol=2e-4)


def test_dpm_first_order_matches_analytic():
    """First-order step must equal alpha_t*x0 + (sig_t/sig_s)*(x - alpha_s*x0)."""
    sch = make_sd15_schedule()
    solver = DPMSolverMultistep.create(sch, 10)
    xs = solver.scan_inputs()
    step = {k: v[0] for k, v in xs.items()}  # step 0 is always first order
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 4, 4).astype(np.float32))
    out, m = solver.step(step, x, eps, jnp.zeros_like(x))

    s_s, s_t = solver.sigmas[0], solver.sigmas[1]
    a_s = 1 / np.sqrt(s_s**2 + 1)
    a_t = 1 / np.sqrt(s_t**2 + 1)
    x0 = (np.asarray(x) - s_s * a_s * np.asarray(eps)) / a_s
    expected = a_t * x0 + (s_t * a_t) / (s_s * a_s) * (np.asarray(x) - a_s * x0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m), x0, rtol=1e-4, atol=1e-5)


def test_dpm_add_noise_matches_ddpm_at_timestep():
    sch = make_sd15_schedule()
    solver = DPMSolverMultistep.create(sch, 10)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    eps = jnp.asarray(rng.randn(1, 4, 8, 8).astype(np.float32))
    got = solver.add_noise(x, eps, 0)
    # sigma at step 0 was interpolated at timestep 999 exactly
    t0 = int(solver.timesteps[0])
    want = sch.add_noise(x, eps, jnp.asarray([t0]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)


def test_squaredcos_schedule_builds():
    sch = DDPMSchedule.create(beta_schedule="squaredcos_cap_v2", num_train_timesteps=100)
    assert sch.alphas_cumprod.shape == (100,)
    assert np.all(sch.alphas_cumprod > 0) and np.all(sch.alphas_cumprod < 1)


def test_dpm_solver_matches_stateful_formulation():
    """The static per-step (a, b, c) coefficients must reproduce the
    canonical stateful DPM-Solver++(2M) update (convert-to-x0, log-SNR
    steps, midpoint second order, first order on warmup/final steps)."""
    sch = make_sd15_schedule()
    for n in (6, 25):
        solver = DPMSolverMultistep.create(sch, n)
        sigmas = solver.sigmas
        rng = np.random.RandomState(n)
        x_mine = rng.randn(2, 4, 4, 4).astype(np.float64)
        x_ref = x_mine.copy()
        eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

        xs = solver.scan_inputs()
        m_prev = np.zeros_like(x_mine)
        m_hist = []
        for i in range(n):
            # mine: static linear combination
            step = {k: np.asarray(v[i], np.float64) for k, v in xs.items()}
            m = (x_mine - step["eps_coef"] * eps_seq[i]) * step["x0_scale"]
            x_mine = step["a"] * x_mine + step["b"] * m + step["c"] * m_prev
            m_prev = m

            # reference: stateful formulas
            s0, t = sigmas[i], sigmas[i + 1]
            a_s0 = 1 / np.sqrt(s0**2 + 1)
            sg_s0 = s0 * a_s0
            m0 = (x_ref - sg_s0 * eps_seq[i]) / a_s0
            m_hist.append(m0)
            first_order = (
                i == 0 or i == n - 1 or (i == n - 2 and n < 15)
            )
            if t == 0.0:
                x_ref = m0
            else:
                a_t = 1 / np.sqrt(t**2 + 1)
                sg_t = t * a_t
                lam_t = np.log(a_t / sg_t)
                lam_s0 = np.log(a_s0 / sg_s0)
                h = lam_t - lam_s0
                if first_order:
                    x_ref = (sg_t / sg_s0) * x_ref - a_t * np.expm1(-h) * m0
                else:
                    s1 = sigmas[i - 1]
                    a_s1 = 1 / np.sqrt(s1**2 + 1)
                    sg_s1 = s1 * a_s1
                    lam_s1 = np.log(a_s1 / sg_s1)
                    r0 = (lam_s0 - lam_s1) / h
                    D0 = m0
                    D1 = (m0 - m_hist[-2]) / r0
                    x_ref = (
                        (sg_t / sg_s0) * x_ref
                        - a_t * np.expm1(-h) * D0
                        - 0.5 * a_t * np.expm1(-h) * D1
                    )
            np.testing.assert_allclose(
                x_mine, x_ref, rtol=1e-4, atol=1e-5,
                err_msg=f"n={n} step {i}",
            )
