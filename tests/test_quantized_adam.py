"""int8 blockwise Adam vs f32 optax.adam trajectories + quantization ops."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from insv2v_tpu.training.quantized_adam import (
    adam8bit,
    dequantize_blockwise,
    quantize_blockwise,
)


def test_quantize_roundtrip_error_bounded():
    x = jax.random.normal(jax.random.PRNGKey(0), (1000,)) * 3.0
    codes, scale = quantize_blockwise(x)
    assert codes.dtype == jnp.int8
    back = dequantize_blockwise(codes, scale, x.shape)
    # log-spaced code: ~4% relative error, 1e-4*absmax absolute floor
    err = np.abs(np.asarray(back - x))
    bound = 0.04 * np.abs(np.asarray(x)) + 1.1e-4 * np.abs(np.asarray(x)).max()
    assert np.all(err <= bound)


def test_unsigned_quantize_wide_dynamic_range():
    # second-moment-like values spanning 6 decades must keep relative error
    x = jnp.asarray(10.0 ** np.linspace(-6, 0, 256)).astype(jnp.float32)
    codes, scale = quantize_blockwise(x, signed=False)
    back = dequantize_blockwise(codes, scale, x.shape, signed=False)
    rel = np.abs(np.asarray(back - x)) / np.asarray(x)
    assert rel.max() < 0.05


def test_quantize_handles_zeros_and_nonmultiple_sizes():
    x = jnp.zeros((100,))
    codes, scale = quantize_blockwise(x)
    back = dequantize_blockwise(codes, scale, x.shape)
    np.testing.assert_allclose(np.asarray(back), 0.0)


def test_adam8bit_tracks_f32_adam():
    params = {
        "big": jax.random.normal(jax.random.PRNGKey(1), (128, 64)),  # quantized
        "small": jax.random.normal(jax.random.PRNGKey(2), (16,)),  # f32 path
    }
    tx_q = adam8bit(1e-2)
    tx_f = optax.adam(1e-2)
    sq = tx_q.init(params)
    sf = tx_f.init(params)
    pq = params
    pf = params
    for i in range(10):
        g = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.PRNGKey(100 + i), p.shape)
            * 0.1 + 0.05 * p, pf)
        uq, sq = tx_q.update(g, sq, pq)
        uf, sf = tx_f.update(g, sf, pf)
        pq = optax.apply_updates(pq, uq)
        pf = optax.apply_updates(pf, uf)
    for k in params:
        a, b = np.asarray(pq[k]), np.asarray(pf[k])
        denom = np.abs(params[k] - b).max() + 1e-8  # total movement scale
        assert np.abs(a - b).max() / denom < 0.15, k
    # small leaf is exact (f32 path)
    np.testing.assert_allclose(np.asarray(pq["small"]), np.asarray(pf["small"]),
                               atol=1e-6)


def test_state_is_actually_int8():
    params = {"w": jnp.ones((512, 16))}
    tx = adam8bit(1e-3)
    state = tx.init(params)
    assert state.m_codes["w"].dtype == jnp.int8
    assert state.v_codes["w"].dtype == jnp.int8
    # memory: codes (8k int8) + scales (32 f32) << f32 moments (32KB)
    assert state.m_codes["w"].size == 512 * 16


def test_trainer_supports_adam8bit():
    import flax.linen as nn

    from insv2v_tpu.training import trainer as tr_mod

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8, name="motion_modules_0")(
                nn.Dense(8, name="frozen")(x))

    m = M()
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))["params"]
    cfg = tr_mod.TrainConfig(optimizer="adam8bit")
    tx = tr_mod.make_optimizer(cfg, p)
    s = tx.init(p)
    g = jax.tree_util.tree_map(jnp.ones_like, p)
    u, s = tx.update(g, s, p)
    # frozen leaf update is zero, motion leaf is not
    assert float(jnp.abs(u["frozen"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(u["motion_modules_0"]["kernel"]).max()) > 0.0
