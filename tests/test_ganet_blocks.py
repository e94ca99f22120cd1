"""GANet-capability blocks: shapes + gradient flow."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcanet_tpu.nn.ganet import LGABlock, SGABlock

KEY = jax.random.PRNGKey(0)


@pytest.mark.slow
def test_sga_block(rng):
    cost = jnp.asarray(rng.standard_normal((1, 6, 8, 10, 4), dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((1, 8, 10, 16), dtype=np.float32))
    m = SGABlock(hidden=8)
    v = m.init(KEY, cost, gf, True)
    out, _ = m.apply(v, cost, gf, True, mutable=["batch_stats"])
    assert out.shape == cost.shape
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        o, _ = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            cost, gf, True, mutable=["batch_stats"],
        )
        return jnp.sum(o * o)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


@pytest.mark.slow
def test_lga_block(rng):
    cost = jnp.asarray(rng.standard_normal((1, 4, 8, 10, 2), dtype=np.float32))
    gf = jnp.asarray(rng.standard_normal((1, 8, 10, 16), dtype=np.float32))
    m = LGABlock(radius=1, hidden=8)
    v = m.init(KEY, cost, gf, True)
    out, _ = m.apply(v, cost, gf, True, mutable=["batch_stats"])
    assert out.shape == cost.shape
    assert np.isfinite(np.asarray(out)).all()
