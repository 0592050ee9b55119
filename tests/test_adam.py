"""Adam parity vs the reference AdamOptimizer math."""

import jax.numpy as jnp
import numpy as np

from dorylus_tpu.optim.adam import adam_init, adam_update

from oracle import adam_step


def test_adam_matches_reference_math():
    rng = np.random.default_rng(0)
    w = rng.normal(size=(5, 3)).astype(np.float32)
    params = {"w": jnp.asarray(w)}
    state = adam_init(params)

    ow = w.astype(np.float64)
    om = np.zeros_like(ow)
    ov = np.zeros_like(ow)

    for t in range(1, 6):
        g = rng.normal(size=(5, 3)).astype(np.float32)
        params, state = adam_update(params, {"w": jnp.asarray(g)}, state)
        ow, om, ov = adam_step(ow, g.astype(np.float64), om, ov, t)
        np.testing.assert_allclose(np.asarray(params["w"]), ow, rtol=1e-5, atol=1e-6)
    assert int(state.step) == 5
