"""Extended sampler tests: Euler / Euler-Ancestral / Karras-sigma grids.

The reference exposes only DPM-Solver++ at inference
(/root/reference/models/infer.py:39-40); these samplers are the standard
diffusers quality knobs its users reach for (EulerDiscreteScheduler,
EulerAncestralDiscreteScheduler, use_karras_sigmas=True) — implemented in
the same static-affine `lax.scan` form as the DPM solver
(photoverse_tpu/core/schedulers.py). Every test here validates the static
coefficients against an independently-written stateful textbook/diffusers
formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# convergence-order / cross-family numerical studies (minutes): slow tier
pytestmark = pytest.mark.slow

from photoverse_tpu.core import (
    DPMSolverMultistep,
    SCHEDULER_NAMES,
    make_sd15_schedule,
    make_solver,
)
from photoverse_tpu.core.schedulers import _karras_sigmas, _sigma_to_t


def _sigma_table(sch):
    return np.sqrt((1.0 - sch.alphas_cumprod) / sch.alphas_cumprod)


def test_karras_grid_formula():
    sch = make_sd15_schedule()
    table = _sigma_table(sch)
    n = 10
    sig = _karras_sigmas(float(table[0]), float(table[-1]), n)
    # descending, endpoints exactly the full-table sigma range
    assert np.all(np.diff(sig) < 0)
    np.testing.assert_allclose(sig[0], table[-1], rtol=1e-12)
    np.testing.assert_allclose(sig[-1], table[0], rtol=1e-12)
    # rho-7 closed form at an interior ramp point
    rho = 7.0
    ramp = np.linspace(0, 1, n)[3]
    want = (
        table[-1] ** (1 / rho) + ramp * (table[0] ** (1 / rho) - table[-1] ** (1 / rho))
    ) ** rho
    np.testing.assert_allclose(sig[3], want, rtol=1e-12)


def test_sigma_to_t_roundtrips_table_points():
    sch = make_sd15_schedule()
    table = _sigma_table(sch)
    log_sigmas = np.log(table)
    ts = np.array([0, 1, 57, 500, 998], dtype=np.float64)
    got = _sigma_to_t(table[ts.astype(int)], log_sigmas)
    np.testing.assert_allclose(got, ts, atol=1e-9)


def test_dpm_karras_exact_for_consistent_model():
    """The exact-ODE-solution property of DPM-Solver++ holds on ANY sigma
    grid, so a model whose eps is consistent with a fixed x0 must be
    recovered exactly on the Karras grid too."""
    sch = make_sd15_schedule()
    for n in (5, 25):
        solver = DPMSolverMultistep.create(sch, n, use_karras_sigmas=True)
        assert np.all(np.diff(solver.sigmas) < 0) or solver.sigmas[-1] == 0.0
        rng = np.random.RandomState(1)
        x0_true = rng.randn(1, 4, 8, 8).astype(np.float32)
        noise = rng.randn(1, 4, 8, 8).astype(np.float32)
        sigma0 = solver.sigmas[0]
        alpha0 = 1.0 / np.sqrt(sigma0**2 + 1)
        x = jnp.asarray(alpha0 * x0_true + sigma0 * alpha0 * noise)
        xs = solver.scan_inputs()
        m_prev = jnp.zeros_like(x)
        for i in range(n):
            step = {k: v[i] for k, v in xs.items()}
            eps = (x - jnp.asarray(x0_true) / step["x0_scale"]) / step["eps_coef"]
            x, m_prev = solver.step(step, x, eps, m_prev)
        np.testing.assert_allclose(np.asarray(x), x0_true, rtol=2e-4, atol=2e-4)


def test_dpm_karras_timesteps_are_ints_from_log_interp():
    sch = make_sd15_schedule()
    solver = DPMSolverMultistep.create(sch, 25, use_karras_sigmas=True)
    assert solver.timesteps.dtype == np.int64
    assert solver.timesteps[0] == sch.num_train_timesteps - 1
    assert np.all(np.diff(solver.timesteps) < 0)
    # scan t stays int32 for integer grids
    assert solver.scan_inputs()["t"].dtype == jnp.int32


def test_euler_fractional_timesteps():
    sch = make_sd15_schedule()
    solver = DPMSolverMultistep.create_euler(sch, 7)
    want = np.linspace(0, 999, 7)[::-1]
    np.testing.assert_allclose(solver.timesteps, want, rtol=1e-12)
    # fractional grid -> float32 t in the scan
    assert solver.scan_inputs()["t"].dtype == jnp.float32
    # VP-space sigma_max: diffusers' VE init (sigma_max * z) divided by
    # sqrt(sigma_max^2 + 1)
    s0 = solver.sigmas[0]
    np.testing.assert_allclose(
        solver.init_noise_sigma, s0 / np.sqrt(s0**2 + 1), rtol=1e-12
    )


def test_euler_exact_for_consistent_model():
    """Euler integrates X = x0 + sig*eps exactly when eps is constant along
    the trajectory (the VE-space path is linear in sigma)."""
    sch = make_sd15_schedule()
    for n, karras in ((5, False), (25, False), (25, True)):
        solver = DPMSolverMultistep.create_euler(sch, n, use_karras_sigmas=karras)
        rng = np.random.RandomState(2)
        x0_true = rng.randn(1, 4, 8, 8).astype(np.float32)
        noise = rng.randn(1, 4, 8, 8).astype(np.float32)
        sigma0 = solver.sigmas[0]
        alpha0 = 1.0 / np.sqrt(sigma0**2 + 1)
        x = jnp.asarray(alpha0 * x0_true + sigma0 * alpha0 * noise)
        xs = solver.scan_inputs()
        m_prev = jnp.zeros_like(x)
        for i in range(n):
            step = {k: v[i] for k, v in xs.items()}
            eps = (x - jnp.asarray(x0_true) / step["x0_scale"]) / step["eps_coef"]
            x, m_prev = solver.step(step, x, eps, m_prev)
        np.testing.assert_allclose(
            np.asarray(x), x0_true, rtol=2e-4, atol=2e-4,
            err_msg=f"n={n} karras={karras}",
        )


@pytest.mark.parametrize("karras", [False, True])
def test_euler_matches_stateful_ve_formulation(karras):
    """Our VP-space affine coefficients must reproduce the canonical
    VE-space Euler update (diffusers EulerDiscreteScheduler semantics:
    pred_x0 = X - sig*eps, derivative = eps, X' = X + (sig'-sig)*eps),
    converted step-by-step via x_VP = alpha * X_VE."""
    sch = make_sd15_schedule()
    n = 9
    solver = DPMSolverMultistep.create_euler(sch, n, use_karras_sigmas=karras)
    sigmas = solver.sigmas
    rng = np.random.RandomState(7)
    z = rng.randn(2, 4, 4, 4).astype(np.float64)
    eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

    x_vp = z * solver.init_noise_sigma
    x_ve = z * sigmas[0]
    xs = solver.scan_inputs()
    m_prev = np.zeros_like(x_vp)
    for i in range(n):
        step = {k: np.asarray(v[i], np.float64) for k, v in xs.items()}
        m = (x_vp - step["eps_coef"] * eps_seq[i]) * step["x0_scale"]
        x_vp = step["a"] * x_vp + step["b"] * m + step["c"] * m_prev
        m_prev = m

        x_ve = x_ve + (sigmas[i + 1] - sigmas[i]) * eps_seq[i]
        alpha_next = 1.0 / np.sqrt(sigmas[i + 1] ** 2 + 1.0)
        np.testing.assert_allclose(
            x_vp, alpha_next * x_ve, rtol=1e-4, atol=1e-5,
            err_msg=f"step {i}",
        )


def test_euler_ancestral_matches_stateful():
    """Ancestral variant vs the canonical EulerAncestralDiscreteScheduler
    update: sigma_up/down split, X' = X + (sig_down - sig)*eps + sig_up*z."""
    sch = make_sd15_schedule()
    n = 8
    solver = DPMSolverMultistep.create_euler(sch, n, ancestral=True)
    assert solver.is_ancestral
    sigmas = solver.sigmas
    rng = np.random.RandomState(11)
    z0 = rng.randn(2, 4, 4, 4).astype(np.float64)
    eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]
    z_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

    x_vp = z0 * solver.init_noise_sigma
    x_ve = z0 * sigmas[0]
    xs = solver.scan_inputs()
    m_prev = np.zeros_like(x_vp)
    for i in range(n):
        step = {k: np.asarray(v[i], np.float64) for k, v in xs.items()}
        m = (x_vp - step["eps_coef"] * eps_seq[i]) * step["x0_scale"]
        x_vp = step["a"] * x_vp + step["b"] * m + step["c"] * m_prev
        x_vp = x_vp + step["noise_sigma"] * z_seq[i]
        m_prev = m

        sig_f, sig_n = sigmas[i], sigmas[i + 1]
        if sig_n > 0:
            sig_up = np.sqrt(sig_n**2 * (sig_f**2 - sig_n**2) / sig_f**2)
            sig_down = np.sqrt(sig_n**2 - sig_up**2)
        else:
            sig_up, sig_down = 0.0, 0.0
        x_ve = x_ve + (sig_down - sig_f) * eps_seq[i] + sig_up * z_seq[i]
        alpha_next = 1.0 / np.sqrt(sig_n**2 + 1.0)
        np.testing.assert_allclose(
            x_vp, alpha_next * x_ve, rtol=1e-4, atol=1e-5,
            err_msg=f"step {i}",
        )
    # the last step injects no noise (sigma_next == 0)
    assert solver.noise_sigma[-1] == 0.0


def test_plain_euler_is_not_ancestral():
    sch = make_sd15_schedule()
    assert not DPMSolverMultistep.create_euler(sch, 5).is_ancestral
    assert not DPMSolverMultistep.create(sch, 5).is_ancestral
    assert not DPMSolverMultistep.create_ddim(sch, 5).is_ancestral
    # ancestral scan feeds noise_sigma + step index
    anc = DPMSolverMultistep.create_euler(sch, 5, ancestral=True)
    xs = anc.scan_inputs()
    assert "noise_sigma" in xs and "i" in xs
    assert "noise_sigma" not in DPMSolverMultistep.create(sch, 5).scan_inputs()


def test_make_solver_factory():
    sch = make_sd15_schedule()
    for name in SCHEDULER_NAMES:
        s = make_solver(sch, name, 6)
        # heun / dpm_2s_a spend 2 model evals per grid step; pndm's warmup
        # double-eval on the first step costs N+1
        two_eval = name.startswith("heun") or name.startswith("dpm_2s_a")
        expect = 11 if two_eval else (7 if name == "pndm" else 6)
        assert s.num_steps == expect
        assert s.is_ancestral == (
            name.startswith("euler_a")
            or name.startswith("dpm_sde")
            or name.startswith("dpm_2s_a")
        )
    # karras via flag == karras via suffix
    a = make_solver(sch, "dpm_karras", 8)
    b = make_solver(sch, "dpm", 8, use_karras_sigmas=True)
    np.testing.assert_array_equal(a.timesteps, b.timesteps)
    np.testing.assert_allclose(a.sigmas, b.sigmas)
    with pytest.raises(ValueError):
        make_solver(sch, "ddim", 6, use_karras_sigmas=True)
    with pytest.raises(ValueError):
        make_solver(sch, "plms", 6)


def test_euler_a_denoise_rows_independent_of_batch():
    """The serving invariant, extended to ancestral samplers: a row's image
    depends only on its own (initial noise, ancestral row key) — not on
    which batch it was coalesced into (engine/inference.py per-row
    _step_noise)."""
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create_euler(modules.schedule, 4, ancestral=True)
    batch = tiny_batch(B=2, seed=3)
    ex2 = {k: jnp.asarray(v) for k, v in batch.items()}
    keys = jax.random.split(jax.random.PRNGKey(42), 2)
    noise = jax.random.normal(jax.random.PRNGKey(5), (2, LATENT, LATENT, 4))

    imgs2 = run_inference(
        modules, params, solver, ex2, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
        initial_noise=noise, ancestral_keys=keys,
    )
    ex1 = {k: v[1:] for k, v in ex2.items()}
    imgs1 = run_inference(
        modules, params, solver, ex1, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
        initial_noise=noise[1:], ancestral_keys=keys[1:],
    )
    np.testing.assert_allclose(
        np.asarray(imgs2[1]), np.asarray(imgs1[0]), atol=1e-5
    )
    # and the ancestral noise actually flows: different row keys -> different image
    imgs_alt = run_inference(
        modules, params, solver, ex1, jax.random.PRNGKey(0),
        guidance_scale=1.0, token_index=0, latent_size=LATENT,
        initial_noise=noise[1:], ancestral_keys=jax.random.split(jax.random.PRNGKey(7), 1),
    )
    assert float(np.abs(np.asarray(imgs_alt) - np.asarray(imgs1)).max()) > 1e-4


@pytest.mark.parametrize("karras", [False, True])
def test_dpm_sde_marginal_preservation(karras):
    """Analytic invariant of sde-dpmsolver++ ("DPM++ 2M SDE"): when every
    x0-prediction equals the true x0 (D1 = 0), each step maps the EXACT
    marginal at sigma_s to the EXACT marginal at sigma_t —
        mean:  a * alpha_s + (b + c) == alpha_t
        var:   a^2 * (sig_s*alpha_s)^2 + noise_sigma^2 == (sig_t*alpha_t)^2
    This pins both the deterministic coefficients and the noise schedule
    without reference to any other implementation."""
    sch = make_sd15_schedule()
    for n in (5, 12, 50):
        solver = make_solver(sch, "dpm_sde", n, use_karras_sigmas=karras)
        assert solver.is_ancestral
        for i in range(n):
            sig_s, sig_t = solver.sigmas[i], solver.sigmas[i + 1]
            a_s = 1.0 / np.sqrt(sig_s**2 + 1)
            a_t = 1.0 / np.sqrt(sig_t**2 + 1)
            mean = solver.a[i] * a_s + solver.b[i] + solver.c[i]
            np.testing.assert_allclose(mean, a_t, rtol=1e-9,
                                       err_msg=f"mean n={n} step {i}")
            var = (solver.a[i] * sig_s * a_s) ** 2 + solver.noise_sigma[i] ** 2
            np.testing.assert_allclose(var, (sig_t * a_t) ** 2,
                                       rtol=1e-9, atol=1e-14,
                                       err_msg=f"var n={n} step {i}")
        # final step is the exact x0 handoff with no noise
        assert solver.noise_sigma[-1] == 0.0
        assert solver.a[-1] == 0.0 and solver.b[-1] == 1.0


def test_dpm_sde_matches_stateful_formulation():
    """Static coefficients vs an independently-written stateful
    sde-dpmsolver++ midpoint update (diffusers algorithm_type
    "sde-dpmsolver++", solver_type "midpoint"), shared noise sequence."""
    sch = make_sd15_schedule()
    n = 9
    solver = make_solver(sch, "dpm_sde", n)
    sigmas = solver.sigmas
    rng = np.random.RandomState(13)
    x_mine = rng.randn(2, 4, 4, 4).astype(np.float64)
    x_ref = x_mine.copy()
    eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]
    z_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

    xs = solver.scan_inputs()
    m_prev = np.zeros_like(x_mine)
    m_hist = []
    for i in range(n):
        step = {k: np.asarray(v[i], np.float64) for k, v in xs.items()}
        m = (x_mine - step["eps_coef"] * eps_seq[i]) * step["x0_scale"]
        x_mine = (step["a"] * x_mine + step["b"] * m + step["c"] * m_prev
                  + step["noise_sigma"] * z_seq[i])
        m_prev = m

        # stateful reference
        s0, t = sigmas[i], sigmas[i + 1]
        a_s0 = 1 / np.sqrt(s0**2 + 1)
        sg_s0 = s0 * a_s0
        m0 = (x_ref - sg_s0 * eps_seq[i]) / a_s0
        m_hist.append(m0)
        first_order = i == 0 or i == n - 1 or (i == n - 2 and n < 15)
        if t == 0.0:
            x_ref = m0
        else:
            a_t = 1 / np.sqrt(t**2 + 1)
            sg_t = t * a_t
            h = np.log(a_t / sg_t) - np.log(a_s0 / sg_s0)
            e_h = np.exp(-h)
            e_2h = 1.0 - np.exp(-2.0 * h)
            det = (sg_t / sg_s0) * e_h * x_ref
            if first_order:
                det = det + a_t * e_2h * m0
            else:
                s1 = sigmas[i - 1]
                a_s1 = 1 / np.sqrt(s1**2 + 1)
                sg_s1 = s1 * a_s1
                r0 = (np.log(a_s0 / sg_s0) - np.log(a_s1 / sg_s1)) / h
                D1 = (m0 - m_hist[-2]) / r0
                det = det + a_t * e_2h * (m0 + 0.5 * D1)
            x_ref = det + sg_t * np.sqrt(e_2h) * z_seq[i]
        np.testing.assert_allclose(
            x_mine, x_ref, rtol=1e-4, atol=1e-7, err_msg=f"step {i}",
        )


class _StatefulUniPC:
    """Independent stateful UniPC (bh2, predict_x0, order 2, corrector on)
    mirroring diffusers' UniPCMultistepScheduler control flow: generic
    R-matrix/b-vector corrector solve, fixed midpoint rhos_p=[0.5] at
    predictor order 2, this_order carried across the corrector boundary."""

    def __init__(self, sigmas, N, order=2):
        self.sigmas = sigmas
        self.N = N
        self.order = order
        self.model_outputs = []
        self.last_sample = None
        self.lower_order_nums = 0
        self.this_order = None

    @staticmethod
    def _split(sig):
        a = 1.0 / np.sqrt(sig**2 + 1.0)
        return a, sig * a

    def _lam(self, sig):
        a, s = self._split(sig)
        return np.log(a / s)

    def _uni_c(self, m_t, last_sample, order, i):
        s0, t = self.sigmas[i - 1], self.sigmas[i]
        a_t, sig_t = self._split(t)
        a_s0, sig_s0 = self._split(s0)
        h = self._lam(t) - self._lam(s0)
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1  # bh2
        m0 = self.model_outputs[-1]
        rks, D1s = [], []
        for k in range(1, order):
            rk = (self._lam(self.sigmas[i - 1 - k]) - self._lam(s0)) / h
            rks.append(rk)
            D1s.append((self.model_outputs[-(k + 1)] - m0) / rk)
        rks.append(1.0)
        R, bv = [], []
        h_phi_k = h_phi_1 / hh - 1.0
        fact = 1
        for k in range(1, order + 1):
            R.append(np.power(np.asarray(rks), k - 1))
            bv.append(h_phi_k * fact / B_h)
            fact *= k + 1
            h_phi_k = h_phi_k / hh - 1.0 / fact
        if order == 1:
            rhos = np.array([0.5])
        else:
            rhos = np.linalg.solve(np.stack(R), np.asarray(bv))
        x_t_ = (sig_t / sig_s0) * last_sample - a_t * h_phi_1 * m0
        corr = sum(rhos[k] * D1s[k] for k in range(len(D1s)))
        return x_t_ - a_t * B_h * (corr + rhos[-1] * (m_t - m0))

    def _uni_p(self, sample, order, i):
        s0, t = self.sigmas[i], self.sigmas[i + 1]
        m0 = self.model_outputs[-1]
        if t == 0.0:
            assert order == 1
            return m0
        a_t, sig_t = self._split(t)
        a_s0, sig_s0 = self._split(s0)
        h = self._lam(t) - self._lam(s0)
        hh = -h
        h_phi_1 = np.expm1(hh)
        B_h = h_phi_1
        x_t_ = (sig_t / sig_s0) * sample - a_t * h_phi_1 * m0
        if order == 2:
            rk = (self._lam(self.sigmas[i - 1]) - self._lam(s0)) / h
            D1 = (self.model_outputs[-2] - m0) / rk
            return x_t_ - a_t * B_h * 0.5 * D1
        return x_t_

    def step(self, eps, i, x):
        a_s0, sig_s0 = self._split(self.sigmas[i])
        m = (x - sig_s0 * eps) / a_s0  # converted from the UNCORRECTED x
        if i > 0:
            x = self._uni_c(m, self.last_sample, self.this_order, i)
        self.model_outputs.append(m)
        self.this_order = min(min(self.order, self.N - i),
                              self.lower_order_nums + 1)
        self.last_sample = x
        x_next = self._uni_p(x, self.this_order, i)
        if self.lower_order_nums < self.order:
            self.lower_order_nums += 1
        return x_next, x


def _drive_static(solver, eps_seq, x0_init):
    """Run the static-coefficient carry through advance(), returning the
    per-step (next_sample, corrected_sample) pairs."""
    import jax

    xs = solver.scan_inputs()
    carry = solver.init_carry(jnp.asarray(x0_init, jnp.float32))
    out = []
    for i in range(solver.num_steps):
        step_in = jax.tree.map(lambda v: v[i], xs)
        carry = solver.advance(step_in, carry, jnp.asarray(eps_seq[i], jnp.float32))
        out.append((np.asarray(carry[0], np.float64),
                    np.asarray(carry[1], np.float64)))
    return out


@pytest.mark.parametrize("karras", [False, True])
def test_unipc_matches_stateful_formulation(karras):
    """Static corrector+predictor coefficients vs the independent stateful
    UniPC above, step by step (both next samples and corrected samples)."""
    sch = make_sd15_schedule()
    for n in (3, 6, 25):
        solver = make_solver(sch, "unipc", n, use_karras_sigmas=karras)
        assert solver.has_corrector
        rng = np.random.RandomState(n)
        x_init = rng.randn(2, 4, 4, 4).astype(np.float64)
        eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

        mine = _drive_static(solver, eps_seq, x_init)
        ref = _StatefulUniPC(solver.sigmas, n)
        x = x_init.copy()
        for i in range(n):
            x_next, x_corr = ref.step(eps_seq[i], i, x)
            np.testing.assert_allclose(
                mine[i][1], x_corr, rtol=1e-4, atol=1e-5,
                err_msg=f"n={n} karras={karras} corrected sample step {i}",
            )
            np.testing.assert_allclose(
                mine[i][0], x_next, rtol=1e-4, atol=1e-5,
                err_msg=f"n={n} karras={karras} next sample step {i}",
            )
            x = x_next


def test_unipc_exact_for_consistent_model():
    """With eps consistent with a fixed x0 every x0-prediction equals x0,
    all difference terms vanish, and both corrector and predictor are the
    exact transition maps — the solver must recover x0 exactly."""
    sch = make_sd15_schedule()
    import jax

    for n in (5, 25):
        solver = make_solver(sch, "unipc", n)
        rng = np.random.RandomState(1)
        x0_true = rng.randn(1, 4, 8, 8).astype(np.float32)
        noise = rng.randn(1, 4, 8, 8).astype(np.float32)
        sigma0 = solver.sigmas[0]
        alpha0 = 1.0 / np.sqrt(sigma0**2 + 1)
        x = jnp.asarray(alpha0 * x0_true + sigma0 * alpha0 * noise)
        xs = solver.scan_inputs()
        carry = solver.init_carry(x)
        for i in range(n):
            step = jax.tree.map(lambda v: v[i], xs)
            lat = solver.latent(carry)
            eps = (lat - jnp.asarray(x0_true) / step["x0_scale"]) / step["eps_coef"]
            carry = solver.advance(step, carry, eps)
        np.testing.assert_allclose(
            np.asarray(solver.latent(carry)), x0_true, rtol=2e-4, atol=2e-4
        )


def test_unipc_predictor_equals_dpm_when_corrector_disabled():
    """bh2 order-2 predictor == DPM-Solver++(2M) midpoint: with the
    corrector zeroed out, the (a, b, c) trajectories must coincide except
    where the warmup/final order rules differ (UniPC has no N<15
    second-to-last forcing; both force first order at the final zero-sigma
    step and the warmup step). Checked at N=25 where the rules agree."""
    sch = make_sd15_schedule()
    n = 25
    uni = make_solver(sch, "unipc", n)
    dpm = make_solver(sch, "dpm", n)
    np.testing.assert_allclose(uni.a, dpm.a, rtol=1e-12)
    np.testing.assert_allclose(uni.b, dpm.b, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(uni.c, dpm.c, rtol=1e-12, atol=1e-15)


def test_unipc_denoise_runs_jitted():
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = make_solver(modules.schedule, "unipc", 4)
    batch = tiny_batch(B=1, seed=6)
    ex = {k: jnp.asarray(v) for k, v in batch.items()}
    fn = jax.jit(
        lambda p, e, r: run_inference(
            modules, p, solver, e, r,
            guidance_scale=1.0, token_index=0, latent_size=LATENT,
        )
    )
    imgs = fn(params, ex, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(imgs)))


def test_euler_denoise_runs_jitted():
    """Plain Euler end-to-end under jit (fractional float32 timesteps feed
    the sinusoidal embedding, like diffusers)."""
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = DPMSolverMultistep.create_euler(modules.schedule, 3)
    batch = tiny_batch(B=1, seed=4)
    ex = {k: jnp.asarray(v) for k, v in batch.items()}
    fn = jax.jit(
        lambda p, e, r: run_inference(
            modules, p, solver, e, r,
            guidance_scale=1.0, token_index=0, latent_size=LATENT,
        )
    )
    imgs = fn(params, ex, jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(imgs)))


# ---------------------------------------------------------------------------
# Heun (trapezoidal 2nd order, Karras alg. 1 / diffusers HeunDiscreteScheduler)


@pytest.mark.parametrize("karras", [False, True])
def test_heun_matches_stateful_ve_formulation(karras):
    """The interleaved static-affine substeps must reproduce the canonical
    stateful VE-space Heun loop (k-diffusion sample_heun, s_churn=0):
        d  = (X - x0(X, sig)) / sig
        Xp = X + (sig' - sig) * d
        d' = (Xp - x0(Xp, sig')) / sig'
        X' = X + (sig' - sig) * (d + d') / 2      [plain Euler if sig' == 0]
    driven by the same eps sequence (one eps per model eval), converted
    step-by-step via x_VP = alpha * X_VE."""
    sch = make_sd15_schedule()
    for n in (2, 5, 9):
        solver = DPMSolverMultistep.create_heun(
            sch, n, use_karras_sigmas=karras
        )
        assert solver.num_steps == 2 * n - 1
        # grid sigmas (per inference step) are the even-index substep sigmas
        grid = DPMSolverMultistep.create_euler(
            sch, n, use_karras_sigmas=karras
        ).sigmas
        rng = np.random.RandomState(31 + n)
        z = rng.randn(2, 4, 4, 4).astype(np.float64)
        eps_seq = [
            rng.randn(2, 4, 4, 4).astype(np.float64)
            for _ in range(solver.num_steps)
        ]

        # static-affine drive on the f64 coefficient arrays (scan_inputs
        # casts exactly these to f32; the SD sigma range ~157 amplifies f32
        # coefficient rounding past a step-by-step 1e-6 comparison)
        x_vp = z * solver.init_noise_sigma
        m_prev = np.zeros_like(x_vp)
        for i in range(solver.num_steps):
            m = (x_vp - solver.eps_coef[i] * eps_seq[i]) * solver.x0_scale[i]
            x_vp = (
                solver.a[i] * x_vp + solver.b[i] * m + solver.c[i] * m_prev
            )
            m_prev = m

        # stateful VE reference consuming the same eps stream
        x_ve = z * grid[0]
        k = 0  # eps cursor
        for i in range(n):
            sig, sig_n = grid[i], grid[i + 1]
            d = eps_seq[k]  # eps IS the VE derivative for epsilon-pred
            k += 1
            xp = x_ve + (sig_n - sig) * d
            if sig_n == 0.0:
                x_ve = xp
            else:
                d2 = eps_seq[k]
                k += 1
                x_ve = x_ve + (sig_n - sig) * (d + d2) / 2.0
        assert k == solver.num_steps
        alpha_final = 1.0  # final sigma is 0
        np.testing.assert_allclose(
            x_vp, alpha_final * x_ve, rtol=1e-6, atol=1e-8,
            err_msg=f"n={n} karras={karras}",
        )


def test_heun_exact_for_sigma_linear_derivative():
    """Trapezoidal integration is exact when the VE derivative is linear in
    sigma: d(sig) = e0 + sig*e1 gives X(sig_b) = X(sig_a) + e0*(sig_b-sig_a)
    + e1*(sig_b^2-sig_a^2)/2. Euler fails this at coarse grids; Heun must
    land on the analytic endpoint (final sigma 0) to float tolerance."""
    sch = make_sd15_schedule()
    rng = np.random.RandomState(5)
    e0 = rng.randn(1, 4, 4, 4)
    e1 = 0.05 * rng.randn(1, 4, 4, 4)
    for n in (5, 15):
        solver = DPMSolverMultistep.create_heun(sch, n)
        xs = solver.scan_inputs()
        sub_sig = np.asarray(solver.sigmas)  # per-substep input sigmas
        sig0 = sub_sig[0]
        X0 = rng.randn(1, 4, 4, 4)
        # analytic endpoint at sigma=0
        X_exact = X0 + e0 * (0.0 - sig0) + e1 * (0.0 - sig0**2) / 2.0
        x_vp = (1.0 / np.sqrt(sig0**2 + 1.0)) * X0
        m_prev = np.zeros_like(x_vp)
        for i in range(solver.num_steps):
            step = {k: np.asarray(v[i], np.float64) for k, v in xs.items()}
            eps = e0 + sub_sig[i] * e1  # d at this substep's input sigma
            m = (x_vp - step["eps_coef"] * eps) * step["x0_scale"]
            x_vp = step["a"] * x_vp + step["b"] * m + step["c"] * m_prev
            m_prev = m
        # the final first-order step integrates over [sig_{N-1}, 0] with only
        # e0 (Euler): its e1 error is e1*sig_{N-1}^2/2 — exclude by comparing
        # at the LAST nonzero grid point instead of 0 for the strict check.
        np.testing.assert_allclose(
            x_vp, X_exact, rtol=5e-3,
            atol=float(np.max(np.abs(e1))) * float(sub_sig[-2]) ** 2,
            err_msg=f"n={n}",
        )


def test_heun_interleaved_grid_matches_euler():
    """timesteps are [t0, t1, t1, t2, t2, ...] (diffusers repeat_interleave)
    and even-index substeps reproduce Euler's grid exactly."""
    sch = make_sd15_schedule()
    n = 7
    heun = DPMSolverMultistep.create_heun(sch, n)
    euler = DPMSolverMultistep.create_euler(sch, n)
    t = np.asarray(euler.timesteps)
    expect = np.concatenate([t[:1], np.repeat(t[1:], 2)])
    np.testing.assert_allclose(np.asarray(heun.timesteps), expect)
    np.testing.assert_allclose(heun.sigmas[0::2][: n], euler.sigmas[:-1])
    assert heun.init_noise_sigma == euler.init_noise_sigma
    assert not heun.is_ancestral and not heun.has_corrector


def test_heun_denoise_runs_jitted():
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = make_solver(modules.schedule, "heun", 3)
    batch = tiny_batch(B=1, seed=6)
    ex = {k: jnp.asarray(v) for k, v in batch.items()}
    fn = jax.jit(
        lambda p, e, r: run_inference(
            modules, p, solver, e, r,
            guidance_scale=1.0, token_index=0, latent_size=LATENT,
        )
    )
    imgs = fn(params, ex, jax.random.PRNGKey(2))
    assert np.all(np.isfinite(np.asarray(imgs)))


# ---------------------------------------------------------------------------
# LMS (k-lms: Adams-Bashforth order 4 over sigma, diffusers
# LMSDiscreteScheduler)


@pytest.mark.parametrize("karras", [False, True])
def test_lms_matches_stateful_quad_formulation(karras):
    """Static exact-polynomial-integral coefficients vs an independent
    stateful VE-space loop computing each Lagrange-basis integral with
    scipy.integrate.quad — the literal diffusers LMSDiscreteScheduler
    method (order ramp 1..4, derivative history, final segment to 0)."""
    from scipy import integrate

    sch = make_sd15_schedule()
    for n in (3, 9):
        solver = DPMSolverMultistep.create_lms(
            sch, n, use_karras_sigmas=karras
        )
        sigmas = np.asarray(solver.sigmas)
        rng = np.random.RandomState(41 + n)
        z = rng.randn(2, 4, 4, 4).astype(np.float64)
        eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

        # static drive on the f64 coefficient arrays
        x_vp = z * solver.init_noise_sigma
        d_hist = [np.zeros_like(x_vp)] * 3
        for i in range(n):
            lc = solver.lms_c[i]
            x_vp = (
                solver.a[i] * x_vp
                + lc[0] * eps_seq[i]
                + lc[1] * d_hist[0]
                + lc[2] * d_hist[1]
                + lc[3] * d_hist[2]
            )
            d_hist = [eps_seq[i]] + d_hist[:2]

        # stateful quad-based VE reference
        def lms_coeff(order, t, j):
            def f(tau):
                prod = 1.0
                for k in range(order):
                    if j == k:
                        continue
                    prod *= (tau - sigmas[t - k]) / (
                        sigmas[t - j] - sigmas[t - k]
                    )
                return prod

            return integrate.quad(f, sigmas[t], sigmas[t + 1], epsrel=1e-10)[0]

        x_ve = z * sigmas[0]
        derivs = []
        for i in range(n):
            derivs.append(eps_seq[i])
            order = min(i + 1, 4)
            coeffs = [lms_coeff(order, i, j) for j in range(order)]
            x_ve = x_ve + sum(
                c * d for c, d in zip(coeffs, reversed(derivs[-order:]))
            )
        np.testing.assert_allclose(
            x_vp, x_ve, rtol=1e-7, atol=1e-9,
            err_msg=f"n={n} karras={karras} (final sigma 0 -> alpha 1)",
        )


def test_lms_steady_state_exact_for_cubic_derivative():
    """Once the history is full (order 4), each step integrates any cubic
    d(sigma) exactly: seed the carry with the analytic derivatives at the
    last 4 nodes and check the step lands on the analytic X(sigma_next)."""
    sch = make_sd15_schedule()
    n = 10
    solver = DPMSolverMultistep.create_lms(sch, n)
    sigmas = np.asarray(solver.sigmas)
    rng = np.random.RandomState(9)
    coef = [rng.randn(1, 4, 4, 4) * s for s in (1.0, 0.1, 0.01, 0.001)]

    def d(sig):
        return coef[0] + coef[1] * sig + coef[2] * sig**2 + coef[3] * sig**3

    def X_exact(sig):  # antiderivative of d
        return (
            coef[0] * sig
            + coef[1] * sig**2 / 2.0
            + coef[2] * sig**3 / 3.0
            + coef[3] * sig**4 / 4.0
        )

    for i in range(3, n):
        sig_s, sig_t = sigmas[i], sigmas[i + 1]
        alpha_s = 1.0 / np.sqrt(sig_s**2 + 1.0)
        alpha_t = 1.0 / np.sqrt(sig_t**2 + 1.0)
        x_vp = alpha_s * X_exact(sig_s)
        lc = solver.lms_c[i]
        hist = [d(sigmas[i - 1]), d(sigmas[i - 2]), d(sigmas[i - 3])]
        got = (
            solver.a[i] * x_vp
            + lc[0] * d(sig_s) + lc[1] * hist[0]
            + lc[2] * hist[1] + lc[3] * hist[2]
        )
        np.testing.assert_allclose(
            got, alpha_t * X_exact(sig_t), rtol=1e-9, atol=1e-11,
            err_msg=f"step {i}",
        )


def test_lms_warmup_order_ramp():
    """Row i uses min(i+1, 4) history slots (diffusers' order ramp)."""
    sch = make_sd15_schedule()
    solver = DPMSolverMultistep.create_lms(sch, 8)
    assert solver.has_lms and not solver.has_corrector
    assert not solver.is_ancestral
    used = (solver.lms_c != 0.0).sum(axis=1)
    np.testing.assert_array_equal(used, [1, 2, 3, 4, 4, 4, 4, 4])
    # order-1 warmup row IS the Euler step (different decomposition: LMS
    # keeps a = alpha'/alpha and folds the sigma ratio into the eps term),
    # so check numerically: one step from the same state, same eps, agrees.
    euler = DPMSolverMultistep.create_euler(sch, 8)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 4, 4, 4)
    eps = rng.randn(2, 4, 4, 4)
    m = (x - euler.eps_coef[0] * eps) * euler.x0_scale[0]
    via_euler = euler.a[0] * x + euler.b[0] * m
    via_lms = solver.a[0] * x + solver.lms_c[0, 0] * eps
    np.testing.assert_allclose(via_lms, via_euler, rtol=1e-12)


def test_lms_denoise_runs_jitted():
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = make_solver(modules.schedule, "lms", 4)
    batch = tiny_batch(B=1, seed=8)
    ex = {k: jnp.asarray(v) for k, v in batch.items()}
    fn = jax.jit(
        lambda p, e, r: run_inference(
            modules, p, solver, e, r,
            guidance_scale=1.0, token_index=0, latent_size=LATENT,
        )
    )
    imgs = fn(params, ex, jax.random.PRNGKey(3))
    assert np.all(np.isfinite(np.asarray(imgs)))


# ---------------------------------------------------------------------------
# DPM++ 2S ancestral (k-diffusion sample_dpmpp_2s_ancestral, eta=1)


@pytest.mark.parametrize("karras", [False, True])
def test_dpm_2s_a_matches_stateful_kdiffusion(karras):
    """The interleaved substeps must reproduce the canonical stateful
    k-diffusion loop (VE space, lambda = -log sigma, midpoint r=1/2,
    Euler-ancestral sigma split, first-order final step), driven by one
    shared eps stream and one shared per-STEP noise stream."""
    sch = make_sd15_schedule()
    for n in (2, 5, 9):
        solver = DPMSolverMultistep.create_dpm_2s_ancestral(
            sch, n, use_karras_sigmas=karras
        )
        assert solver.num_steps == 2 * n - 1 and solver.is_ancestral
        grid = DPMSolverMultistep.create_euler(
            sch, n, use_karras_sigmas=karras
        ).sigmas
        rng = np.random.RandomState(51 + n)
        z0 = rng.randn(2, 4, 4, 4).astype(np.float64)
        eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64)
                   for _ in range(solver.num_steps)]
        z_seq = [rng.randn(2, 4, 4, 4).astype(np.float64) for _ in range(n)]

        # static-affine drive + per-substep noise (zero on A substeps)
        x_vp = z0 * solver.init_noise_sigma
        m_prev = np.zeros_like(x_vp)
        for i in range(solver.num_steps):
            m = (x_vp - solver.eps_coef[i] * eps_seq[i]) * solver.x0_scale[i]
            x_vp = (
                solver.a[i] * x_vp + solver.b[i] * m + solver.c[i] * m_prev
            )
            # noise stream: one draw per GRID step, consumed on the substep
            # whose noise_sigma is nonzero (B substeps / the final substep)
            if solver.noise_sigma[i] != 0.0:
                x_vp = x_vp + solver.noise_sigma[i] * z_seq[
                    int(np.count_nonzero(solver.noise_sigma[: i + 1])) - 1
                ]
            m_prev = m

        # stateful k-diffusion VE reference, same eps/noise streams
        x = z0 * grid[0]
        k = 0
        for i in range(n):
            sig_s, sig_n = grid[i], grid[i + 1]
            m = x - sig_s * eps_seq[k]  # denoised
            k += 1
            if sig_n > 0:
                sig_up = np.sqrt(
                    sig_n**2 * (sig_s**2 - sig_n**2) / sig_s**2
                )
                sig_down = np.sqrt(sig_n**2 - sig_up**2)
            else:
                sig_up, sig_down = 0.0, 0.0
            if sig_down == 0.0:
                x = x + (sig_down - sig_s) * (x - m) / sig_s
            else:
                h = np.log(sig_s / sig_down)
                sig_mid = np.sqrt(sig_s * sig_down)
                x_2 = (sig_mid / sig_s) * x - np.expm1(-h / 2.0) * m
                m_2 = x_2 - sig_mid * eps_seq[k]
                k += 1
                x = (sig_down / sig_s) * x - np.expm1(-h) * m_2
            if sig_up > 0:
                x = x + sig_up * z_seq[i]
        assert k == solver.num_steps
        np.testing.assert_allclose(
            x_vp, x, rtol=1e-7, atol=1e-9,  # final sigma 0 -> alpha 1
            err_msg=f"n={n} karras={karras}",
        )


def test_dpm_2s_a_exact_for_consistent_model_deterministic_part():
    """Both exponential-integrator substeps are exact when the denoised
    prediction is a constant x0 (the DPM++ exact-ODE property), so with the
    ancestral noise zeroed the trajectory must land on x0."""
    sch = make_sd15_schedule()
    for n in (4, 20):
        solver = DPMSolverMultistep.create_dpm_2s_ancestral(sch, n)
        rng = np.random.RandomState(6)
        x0_true = rng.randn(1, 4, 8, 8)
        noise = rng.randn(1, 4, 8, 8)
        sig0 = solver.sigmas[0]
        alpha0 = 1.0 / np.sqrt(sig0**2 + 1.0)
        x = alpha0 * x0_true + sig0 * alpha0 * noise
        m_prev = np.zeros_like(x)
        for i in range(solver.num_steps):
            eps = (x - x0_true / solver.x0_scale[i]) / solver.eps_coef[i]
            m = (x - solver.eps_coef[i] * eps) * solver.x0_scale[i]
            x = solver.a[i] * x + solver.b[i] * m + solver.c[i] * m_prev
            m_prev = m
        np.testing.assert_allclose(x, x0_true, rtol=1e-6, atol=1e-8,
                                   err_msg=f"n={n}")


def test_dpm_2s_a_substep_structure():
    """A substeps carry no noise; B substeps run at the off-grid midpoint
    sigma with a fractional log-interpolated timestep between the grid
    timesteps; the final substep is first-order (a=0, b=1)."""
    sch = make_sd15_schedule()
    n = 5
    solver = DPMSolverMultistep.create_dpm_2s_ancestral(sch, n)
    euler = DPMSolverMultistep.create_euler(sch, n)
    assert solver.num_steps == 2 * n - 1
    np.testing.assert_array_equal(solver.noise_sigma[0:-1:2], 0.0)
    assert np.all(solver.noise_sigma[1::2] > 0)
    # midpoint sigma is the geometric mean sqrt(sig_s * sig_down) — below
    # the current grid sigma, above the ancestral sig_down (which itself
    # sits below sig_next, so the midpoint may dip under sig_next too)
    for i in range(n - 1):
        sig_s = euler.sigmas[i]
        sig_n = euler.sigmas[i + 1]
        sig_up = np.sqrt(sig_n**2 * (sig_s**2 - sig_n**2) / sig_s**2)
        sig_down = np.sqrt(sig_n**2 - sig_up**2)
        sig_mid = solver.sigmas[2 * i + 1]
        np.testing.assert_allclose(sig_mid, np.sqrt(sig_s * sig_down),
                                   rtol=1e-12)
        assert sig_down < sig_mid < sig_s
        t_mid = solver.timesteps[2 * i + 1]
        assert 0.0 < t_mid < euler.timesteps[i]
    np.testing.assert_allclose(solver.a[-1], 0.0)
    np.testing.assert_allclose(solver.b[-1], 1.0)


def test_dpm_2s_a_denoise_runs_jitted():
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = make_solver(modules.schedule, "dpm_2s_a", 3)
    batch = tiny_batch(B=1, seed=12)
    ex = {k: jnp.asarray(v) for k, v in batch.items()}
    fn = jax.jit(
        lambda p, e, r: run_inference(
            modules, p, solver, e, r,
            guidance_scale=1.0, token_index=0, latent_size=LATENT,
        )
    )
    imgs = fn(params, ex, jax.random.PRNGKey(5))
    assert np.all(np.isfinite(np.asarray(imgs)))


# ---------------------------------------------------------------------------
# PNDM / PLMS (diffusers PNDMScheduler, skip_prk_steps=True — the
# historical SD-1.5 default)


class _StatefulPLMS:
    """Independent stateful PLMS: the literal diffusers PNDMScheduler
    control flow (ets history window, counter, cur_sample warmup redo,
    DDIM-form _get_prev_sample) with skip_prk_steps=True semantics."""

    def __init__(self, schedule, num_inference_steps):
        self.abar = schedule.alphas_cumprod
        self.final_abar = self.abar[0]  # set_alpha_to_one=False
        self.step_ratio = schedule.num_train_timesteps // num_inference_steps
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def _prev(self, sample, t, t_prev, eo):
        a_t = self.abar[t]
        a_p = self.abar[t_prev] if t_prev >= 0 else self.final_abar
        A = np.sqrt(a_p / a_t)
        denom = a_t * np.sqrt(1.0 - a_p) + np.sqrt(
            a_t * (1.0 - a_t) * a_p
        )
        return A * sample - (a_p - a_t) * eo / denom

    def step(self, e, t, x):
        t_prev = t - self.step_ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(e)
        else:
            t_prev = t
            t = t + self.step_ratio
        if len(self.ets) == 1 and self.counter == 0:
            eo = e
            self.cur_sample = x
        elif len(self.ets) == 1 and self.counter == 1:
            eo = (e + self.ets[-1]) / 2.0
            x = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            eo = (3.0 * self.ets[-1] - self.ets[-2]) / 2.0
        elif len(self.ets) == 3:
            eo = (
                23.0 * self.ets[-1] - 16.0 * self.ets[-2]
                + 5.0 * self.ets[-3]
            ) / 12.0
        else:
            eo = (
                55.0 * self.ets[-1] - 59.0 * self.ets[-2]
                + 37.0 * self.ets[-3] - 9.0 * self.ets[-4]
            ) / 24.0
        self.counter += 1
        return self._prev(x, t, t_prev, eo)


def test_pndm_matches_stateful_plms():
    """Static 5-slot coefficients vs the stateful diffusers control flow,
    one shared eps stream, every n (covers all warmup branches + steady)."""
    sch = make_sd15_schedule()
    for n in (1, 2, 3, 4, 5, 9, 25):
        solver = DPMSolverMultistep.create_pndm(sch, n)
        n_sub = solver.num_steps
        assert n_sub == (n + 1 if n > 1 else 1)
        rng = np.random.RandomState(61 + n)
        x0 = rng.randn(2, 4, 4, 4).astype(np.float64)
        eps_seq = [rng.randn(2, 4, 4, 4).astype(np.float64)
                   for _ in range(n_sub)]

        # static drive
        x = x0.copy()
        hist = [np.zeros_like(x)] * 4
        for i in range(n_sub):
            pc = solver.pndm_c[i]
            x = (
                solver.a[i] * x
                + pc[0] * eps_seq[i]
                + pc[1] * hist[0] + pc[2] * hist[1]
                + pc[3] * hist[2] + pc[4] * hist[3]
            )
            hist = [eps_seq[i]] + hist[:3]

        # stateful reference over the interleaved timestep walk
        ref = _StatefulPLMS(sch, n)
        xs_ref = x0.copy()
        for i in range(n_sub):
            xs_ref = ref.step(eps_seq[i], int(solver.timesteps[i]), xs_ref)
        np.testing.assert_allclose(x, xs_ref, rtol=1e-9, atol=1e-11,
                                   err_msg=f"n={n}")


def test_pndm_grid_and_structure():
    sch = make_sd15_schedule()
    n = 6
    solver = DPMSolverMultistep.create_pndm(sch, n)
    ddim = DPMSolverMultistep.create_ddim(sch, n)
    # plms walk = ddim's leading grid with the second timestep doubled
    t = np.asarray(ddim.timesteps)
    expect = np.concatenate([t[:1], np.repeat(t[1:2], 2), t[2:]])
    np.testing.assert_array_equal(np.asarray(solver.timesteps), expect)
    assert solver.has_pndm and not solver.is_ancestral
    assert solver.init_noise_sigma == 1.0
    # warmup redo substep leaves the latent scale alone (a=1) and only
    # nudges by the eps difference
    np.testing.assert_allclose(solver.a[1], 1.0)
    np.testing.assert_allclose(solver.pndm_c[1, 0], -solver.pndm_c[1, 1])
    with pytest.raises(ValueError):
        make_solver(sch, "pndm", 6, use_karras_sigmas=True)


def test_pndm_denoise_runs_jitted():
    from photoverse_tpu.engine.inference import run_inference
    from tiny_models import LATENT, tiny_batch, tiny_bundle

    modules, params = tiny_bundle()
    solver = make_solver(modules.schedule, "pndm", 3)
    batch = tiny_batch(B=1, seed=14)
    ex = {k: jnp.asarray(v) for k, v in batch.items()}
    fn = jax.jit(
        lambda p, e, r: run_inference(
            modules, p, solver, e, r,
            guidance_scale=1.0, token_index=0, latent_size=LATENT,
        )
    )
    imgs = fn(params, ex, jax.random.PRNGKey(7))
    assert np.all(np.isfinite(np.asarray(imgs)))


# ---------------------------------------------------------------------------
# Empirical convergence-order + cross-family ground truth (VERDICT r3 #6).
#
# The diffusers/k-diffusion golden fixtures cannot be recorded in this
# zero-egress environment (tests/test_scheduler_goldens.py skips), and the
# stateful-rederivation parity tests share their author with the
# implementation. These tests provide ground truth NEITHER shares: every
# deterministic sampler integrates the SAME probability-flow ODE
# dX/dsigma = eps(X, sigma) in VE space, so (a) its error against an
# analytically solvable instance must shrink at its textbook order as the
# step count doubles, and (b) at N=200 all families must land on the
# solution computed by an independent test-local RK4 integrator. A wrong
# multistep coefficient shifts the measured order / the converged answer
# even when a rederivation test reproduces the same wrong formula.
# Calibrated ratios (N=16->32->64, see git history): euler 2.08/2.05,
# ddim 1.61/2.34, dpm 3.76/3.27, heun 4.10/4.09, unipc 5.92/5.94,
# lms 3.16/3.46 (warmup-limited), pndm 2.57/4.97 (pre-asymptotic first).
# Reference samplers: /root/reference/models/infer.py:39-40,98-119.
# ---------------------------------------------------------------------------


def _xs64(solver):
    """The solver's static per-step coefficients as float64 numpy."""
    xs = {
        "a": solver.a, "b": solver.b, "c": solver.c,
        "eps_coef": solver.eps_coef, "x0_scale": solver.x0_scale,
    }
    for k in ("lms_c", "pndm_c", "corr_ci", "corr_a", "corr_b_this",
              "corr_b_prev", "corr_b_pp"):
        v = getattr(solver, k)
        if v is not None:
            xs[k] = v
    return {k: np.asarray(v, np.float64) for k, v in xs.items()}


def _run_deterministic_f64(solver, X0_ve, eps_fn):
    """Drive a deterministic solver host-side in float64 via the SAME
    generic carry API the engine's denoise scan uses (init_carry / latent /
    advance). eps_fn(X_ve, sigma) plays the model. Returns X(0)."""
    assert not solver.is_ancestral
    xs = _xs64(solver)
    sig = np.asarray(solver.sigmas, np.float64)
    x = np.asarray(X0_ve, np.float64) / np.sqrt(sig[0] ** 2 + 1.0)
    n_extra = len(solver.init_carry(jnp.zeros((1,)))) - 1
    carry = (x,) + tuple(np.zeros_like(x) for _ in range(n_extra))
    for i in range(solver.num_steps):
        lat = solver.latent(carry)
        X_ve = lat * np.sqrt(sig[i] ** 2 + 1.0)
        eps = eps_fn(X_ve, sig[i])
        carry = solver.advance({k: v[i] for k, v in xs.items()}, carry, eps)
    return carry[0]


_X0_CONV = np.array([[1.7, -0.6], [0.3, 2.1]])

# (name, per-doubling ratio bounds (lo, hi), total err16/err64 reduction
# floor). hi=None skips the upper check (predictor-corrector and warmup
# families exceed their nominal order pre-asymptotically).
_ORDER_CASES = [
    ("euler", (1.5, 3.0), 3.4),
    ("euler_karras", (1.5, 3.0), 3.4),
    ("ddim", (1.4, 3.0), 3.2),
    ("dpm", (2.6, None), 9.0),
    ("dpm_karras", (2.8, None), 9.0),
    ("heun", (3.0, None), 12.0),
    ("heun_karras", (3.0, None), 12.0),
    ("unipc", (4.0, None), 25.0),
    ("unipc_karras", (4.0, None), 25.0),
    ("lms", (2.6, None), 9.0),
    ("lms_karras", (2.8, None), 9.0),
    ("pndm", (2.0, None), 9.0),
]


@pytest.mark.parametrize("name,ratio_bounds,total_floor", _ORDER_CASES)
def test_empirical_convergence_order(name, ratio_bounds, total_floor):
    """eps = (sigma/sigma0)^2 integrates to the analytic
    X(0) = X0 - sigma0/3; halving h must shrink the error at the family's
    textbook order (order-1: ~2x per doubling, order-2+: >=~4x)."""
    sch = make_sd15_schedule()
    errs = []
    for n in (16, 32, 64):
        solver = make_solver(sch, name, n)
        s0 = float(solver.sigmas[0])
        out = _run_deterministic_f64(
            solver, _X0_CONV,
            lambda X, s, s0=s0: np.full_like(X, (s / s0) ** 2),
        )
        exact = _X0_CONV - s0 / 3.0
        errs.append(float(np.max(np.abs(out - exact))))
    lo, hi = ratio_bounds
    for i in range(2):
        ratio = errs[i] / errs[i + 1]
        assert ratio >= lo * (0.9 if i == 0 else 1.0), (name, errs)
        if hi is not None:
            assert ratio <= hi, (name, errs)  # order-1 must NOT look order-2
    assert errs[0] / errs[2] >= total_floor, (name, errs)


def _eps_nonlinear(X, s):
    return np.sin(X / 3.0) * (s / (1.0 + s)) + 0.1 * np.cos(s / 2.0)


def _rk4_truth(sig0, X0, nsub):
    ss = np.linspace(sig0, 0.0, nsub + 1)
    X = np.asarray(X0, np.float64).copy()
    for i in range(nsub):
        h = ss[i + 1] - ss[i]
        k1 = _eps_nonlinear(X, ss[i])
        k2 = _eps_nonlinear(X + 0.5 * h * k1, ss[i] + 0.5 * h)
        k3 = _eps_nonlinear(X + 0.5 * h * k2, ss[i] + 0.5 * h)
        k4 = _eps_nonlinear(X + h * k3, ss[i + 1])
        X = X + h / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)
    return X


# higher-order families must land much closer than the order-1 ones
_AGREEMENT_TOL = {
    "euler": 6e-3, "ddim": 6e-3, "pndm": 6e-3,
    "dpm": 1e-3, "unipc": 1e-3, "heun": 1e-3, "lms": 1e-3,
}


@pytest.mark.parametrize("name", sorted(_AGREEMENT_TOL))
def test_cross_family_agreement_vs_rk4(name):
    """All deterministic samplers at N=200 must converge to the solution of
    the same nonlinear PF-ODE as computed by an INDEPENDENT textbook RK4 —
    a shared misreading of diffusers/k-diffusion coefficients would move
    the converged answer, which RK4 does not share."""
    sch = make_sd15_schedule()
    solver = make_solver(sch, name, 200)
    s0 = float(solver.sigmas[0])
    truth = _rk4_truth(s0, _X0_CONV, 8000)
    # the RK4 reference itself is converged (halving h moves it < 1e-9)
    np.testing.assert_allclose(truth, _rk4_truth(s0, _X0_CONV, 4000),
                               rtol=0, atol=1e-9)
    out = _run_deterministic_f64(solver, _X0_CONV, _eps_nonlinear)
    dev = float(np.max(np.abs(out - truth)))
    assert dev <= _AGREEMENT_TOL[name], (name, dev)
