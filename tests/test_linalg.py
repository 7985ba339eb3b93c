"""ops/linalg: unrolled batched Cholesky solve vs dense reference."""

import jax
import jax.numpy as jnp
import numpy as np

from wiki_grx_gym_tpu.ops.linalg import cholesky_unrolled, spd_solve


def _spd(key, n, batch):
    m = 0.1 * jax.random.normal(key, (batch, n, n))
    return m @ m.transpose(0, 2, 1) + 2.0 * jnp.eye(n)[None]


def test_cholesky_matches_numpy():
    a = _spd(jax.random.PRNGKey(0), 16, 32)
    l = jax.vmap(cholesky_unrolled)(a)
    np.testing.assert_allclose(
        np.asarray(l @ l.transpose(0, 2, 1)), np.asarray(a), rtol=1e-4, atol=1e-5
    )
    # lower triangular
    assert float(jnp.max(jnp.abs(jnp.triu(l, k=1)))) == 0.0


def test_spd_solve_matches_numpy():
    for n in (6, 16, 38):
        a = _spd(jax.random.PRNGKey(n), n, 16)
        b = jax.random.normal(jax.random.PRNGKey(n + 1), (16, n))
        x = jax.jit(jax.vmap(spd_solve))(a, b)
        want = np.linalg.solve(np.asarray(a), np.asarray(b)[..., None])[..., 0]
        np.testing.assert_allclose(np.asarray(x), want, rtol=1e-3, atol=1e-4)
