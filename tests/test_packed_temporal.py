"""Packed (block-diagonal) temporal attention vs the per-head einsum.

The TPU path packs heads*frames into one m axis and masks cross-head
logits to -inf (models/unet3d.py VersatileAttention); masked softmax over
m must equal per-head softmax over F up to float association order.
"""

import jax
import jax.numpy as jnp
import numpy as np

from insv2v_tpu.models import unet3d
from insv2v_tpu.models.unet3d import VersatileAttention


def _run(packed: bool, b=2, f=8, p=24, c=16, heads=4, max_len=32):
    old = unet3d._PACKED_TEMPORAL
    unet3d._PACKED_TEMPORAL = "1" if packed else "0"
    try:
        mod = VersatileAttention(heads=heads, head_dim=c // heads,
                                 max_len=max_len)
        x = jax.random.normal(jax.random.PRNGKey(0), (b, f, p, c))
        params = mod.init(jax.random.PRNGKey(1), x, 0)
        return mod.apply(params, x, 2)
    finally:
        unet3d._PACKED_TEMPORAL = old


def test_packed_matches_plain():
    ref = _run(packed=False)
    out = _run(packed=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_packed_matches_plain_full_heads():
    # the production shape class: heads * frames = 128
    ref = _run(packed=False, b=1, f=16, p=8, c=64, heads=8)
    out = _run(packed=True, b=1, f=16, p=8, c=64, heads=8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
