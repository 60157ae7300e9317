"""Golden-value tests for schedule math against analytic formulas and the
diffusers conventions the reference pins (pl_trainer/inference/inference.py:34-49).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from insv2v_tpu.diffusion.schedules import (
    DiffusionSchedule,
    add_noise,
    ddim_step,
    ddpm_step,
    make_betas,
    make_sampler_tables,
    pred_eps_from_x0,
    pred_x0_from_eps,
)


def make_sched():
    return DiffusionSchedule.create(
        beta_schedule="scaled_linear",
        num_train_timesteps=1000,
        beta_start=0.00085,
        beta_end=0.012,
    )


def test_scaled_linear_betas_endpoints():
    betas = make_betas("scaled_linear", 1000, 0.00085, 0.012)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-12)
    # strictly increasing, all in (0, 1)
    assert np.all(np.diff(betas) > 0)
    assert betas.min() > 0 and betas.max() < 1


def test_cosine_betas_bounded():
    betas = make_betas("cosine", 100)
    assert betas.shape == (100,)
    assert betas.max() <= 0.999 and betas.min() >= 0


def test_alphas_cumprod_matches_manual():
    sched = make_sched()
    betas = make_betas("scaled_linear", 1000, 0.00085, 0.012)
    manual = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), manual, rtol=1e-6)
    # SD-1.5 well-known endpoint value alpha_bar[-1] ~ 0.0047
    assert 0.004 < float(sched.alphas_cumprod[-1]) < 0.006


def test_ddim_timesteps_match_diffusers_leading_convention():
    sched = make_sched()
    t = make_sampler_tables(sched, 20, kind="ddim", steps_offset=1)
    # diffusers DDIMScheduler(set_timesteps(20), steps_offset=1):
    expected = np.arange(0, 1000, 50)[::-1] + 1  # [951, 901, ..., 1]
    np.testing.assert_array_equal(np.asarray(t.timesteps), expected)
    ac = np.asarray(sched.alphas_cumprod)
    np.testing.assert_allclose(np.asarray(t.alpha_prod), ac[expected], rtol=1e-6)
    # last step: set_alpha_to_one=False -> alpha_prev = alphas_cumprod[0]
    np.testing.assert_allclose(float(t.alpha_prod_prev[-1]), float(ac[0]), rtol=1e-6)


def test_ddpm_timesteps_and_terminal_variance():
    sched = make_sched()
    t = make_sampler_tables(sched, 20, kind="ddpm")
    expected = np.arange(0, 1000, 50)[::-1]  # [950, ..., 0]
    np.testing.assert_array_equal(np.asarray(t.timesteps), expected)
    assert float(t.variance[-1]) == 0.0  # t == 0 -> no noise
    assert np.all(np.asarray(t.variance[:-1]) > 0)
    # alpha_prod_prev of last step is exactly 1 (diffusers `one`)
    np.testing.assert_allclose(float(t.alpha_prod_prev[-1]), 1.0)


def test_add_noise_and_x0_roundtrip():
    sched = make_sched()
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 3, 4, 4))
    eps = jax.random.normal(jax.random.fold_in(rng, 1), (2, 3, 4, 4))
    t = jnp.array([100, 900])
    x_t = add_noise(sched, x0, eps, t)
    x0_hat = pred_x0_from_eps(sched, x_t, eps, t)
    np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-4)
    eps_hat = pred_eps_from_x0(sched, x_t, x0, t)
    np.testing.assert_allclose(np.asarray(eps_hat), np.asarray(eps), atol=1e-4)


def test_ddim_step_perfect_eps_recovers_x0():
    """Running the full deterministic DDIM chain with the oracle eps for a
    fixed x0 must walk x_t back to ~x0 (exactness of eq. 12 under a
    consistent eps)."""
    sched = make_sched()
    tables = make_sampler_tables(sched, 20, kind="ddim")
    rng = jax.random.PRNGKey(42)
    x0 = jax.random.normal(rng, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.fold_in(rng, 7), (1, 4, 8, 8))
    t0 = tables.timesteps[0]
    x_t = add_noise(sched, x0, eps, jnp.array([t0]))
    for i in range(20):
        # oracle eps: implied noise of x_t w.r.t. the true x0
        e = pred_eps_from_x0(sched, x_t, x0, tables.timesteps[i][None])
        x_t, x0_hat = ddim_step(tables, x_t, e, jnp.asarray(i))
        np.testing.assert_allclose(np.asarray(x0_hat), np.asarray(x0), atol=1e-3)
    # final latent keeps sqrt(1-alpha_bar[0]) ~ 0.03 of implied noise
    # (set_alpha_to_one=False), so it lands near-but-not-on x0
    np.testing.assert_allclose(np.asarray(x_t), np.asarray(x0), atol=0.2)


def test_ddpm_step_matches_posterior_mean_formula():
    sched = make_sched()
    tables = make_sampler_tables(sched, 20, kind="ddpm")
    i = 5
    t = int(tables.timesteps[i])
    x_t = jnp.ones((1, 4)) * 0.3
    eps = jnp.ones((1, 4)) * 0.1
    zero = jnp.zeros_like(x_t)
    x_prev, x0 = ddpm_step(tables, x_t, eps, jnp.asarray(i), zero)
    ac = np.asarray(sched.alphas_cumprod, dtype=np.float64)
    a_t, a_prev = ac[t], ac[t - 50]
    cur_beta = 1 - a_t / a_prev
    x0_m = (0.3 - np.sqrt(1 - a_t) * 0.1) / np.sqrt(a_t)
    mean = (
        np.sqrt(a_prev) * cur_beta / (1 - a_t) * x0_m
        + np.sqrt(a_t / a_prev) * (1 - a_prev) / (1 - a_t) * 0.3
    )
    np.testing.assert_allclose(np.asarray(x_prev)[0, 0], mean, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(x0)[0, 0], x0_m, rtol=1e-5)


def test_sampler_tables_rejects_unknown_kind():
    sched = make_sched()
    with pytest.raises(ValueError):
        make_sampler_tables(sched, 20, kind="pndm")
