"""Anderson acceleration: convergence, oracle parity, vmap lockstep."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.fp.anderson import anderson
from deqsci_tpu.fp.picard import picard


def anderson_oracle(f, x0, m=5, lam=1e-4, max_iter=50, tol=1e-5, beta=1.0):
    """Numpy re-statement of the reference algorithm
    (solvers/new_equilibrium_utils_yaping.py:153-189) used as a test oracle:
    dynamic history truncation n=min(k,m), bordered (n+1)^2 solve, residual
    on the post-update pair, returns X[k%m]."""
    bsz = x0.shape[0]
    xf = x0.reshape(bsz, -1).astype(np.float64)
    n_flat = xf.shape[1]
    X = np.zeros((bsz, m, n_flat))
    F = np.zeros_like(X)
    calls = [0]

    def ff(v):
        k = calls[0]
        calls[0] += 1
        return f(v.reshape(x0.shape), k).reshape(bsz, -1).astype(np.float64)

    X[:, 0], F[:, 0] = xf, ff(xf)
    X[:, 1], F[:, 1] = F[:, 0], ff(F[:, 0])
    current_k = 0
    res = np.inf
    for k in range(2, max_iter):
        current_k = k
        n = min(k, m)
        G = F[:, :n] - X[:, :n]
        H = np.zeros((bsz, n + 1, n + 1))
        H[:, 0, 1:] = 1.0
        H[:, 1:, 0] = 1.0
        H[:, 1:, 1:] = G @ G.transpose(0, 2, 1) + lam * np.eye(n)
        y = np.zeros((bsz, n + 1))
        y[:, 0] = 1.0
        alpha = np.linalg.solve(H, y[..., None])[:, 1:n + 1, 0]
        xk = beta * np.einsum("bn,bnf->bf", alpha, F[:, :n]) \
            + (1 - beta) * np.einsum("bn,bnf->bf", alpha, X[:, :n])
        X[:, k % m] = xk
        F[:, k % m] = ff(xk)
        res = np.linalg.norm(F[:, k % m] - X[:, k % m]) / (
            1e-5 + np.linalg.norm(F[:, k % m]))
        if res < tol:
            break
    return X[:, current_k % m].reshape(x0.shape), res, current_k


def _contraction(rng, d=24, rate=0.6):
    M = rng.standard_normal((d, d))
    u, _, vt = np.linalg.svd(M)
    M = (u * (rate * rng.random(d))) @ vt  # spectral norm < rate
    b = rng.standard_normal(d)
    return M.astype(np.float32), b.astype(np.float32)


def test_converges_to_fixed_point(rng):
    M, b = _contraction(rng)
    f = lambda z, k: z @ jnp.asarray(M).T + jnp.asarray(b)
    x0 = jnp.zeros((3, M.shape[0]))
    z, info = jax.jit(lambda x: anderson(f, x, m=5, lam=1e-4,
                                         max_iter=60, tol=1e-8))(x0)
    z_true = np.linalg.solve(np.eye(M.shape[0]) - M, b)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(z_true, z.shape),
                               rtol=2e-4, atol=2e-5)
    assert bool(info.converged)


def test_matches_reference_oracle(rng):
    """Same iterates/stopping as the reference algorithm, fp64 oracle.

    The map depends on the call index k (a decaying forcing term, the same
    shape as the FFDNet sigma schedule), so agreement here also proves the
    call indices are threaded in the reference's exact order 0,1,2,...
    """
    M, b = _contraction(rng, d=12, rate=0.8)
    Mj, bj = jnp.asarray(M), jnp.asarray(b)

    f_jax = lambda z, k: z @ Mj.T + bj * jnp.power(0.971, k.astype(z.dtype))
    f_np = lambda z, k: z @ M.T + b * (0.971 ** k)

    x0 = np.ones((2, 12), np.float32)
    z, info = anderson(f_jax, jnp.asarray(x0), m=5, lam=1e-2,
                       max_iter=25, tol=1e-4)
    z_o, res_o, k_o = anderson_oracle(f_np, x0, m=5, lam=1e-2,
                                      max_iter=25, tol=1e-4)
    assert int(info.iterations) == k_o
    np.testing.assert_allclose(np.asarray(z), z_o, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(info.residual), res_o, rtol=1e-3)


def test_next_call_accounting():
    """next_call must point one past the last consumed call index."""
    f = lambda z, k: 0.5 * z + 1.0
    x0 = jnp.zeros((1, 4))
    _, info = anderson(f, x0, m=3, max_iter=10, tol=0.0)
    # loop ran k = 2..9, so calls 0..9 were consumed
    assert int(info.iterations) == 9
    assert int(info.next_call) == 10


def test_vmap_lockstep_matches_solo(rng):
    """vmapping the solver must reproduce per-lane solo results exactly
    (converged lanes freeze while slower lanes continue)."""
    d = 10
    M1, b1 = _contraction(rng, d=d, rate=0.3)   # fast lane
    M2, b2 = _contraction(rng, d=d, rate=0.9)   # slow lane
    Ms = jnp.stack([jnp.asarray(M1), jnp.asarray(M2)])
    bs = jnp.stack([jnp.asarray(b1), jnp.asarray(b2)])

    def solve(Mi, bi):
        f = lambda z, k: z @ Mi.T + bi
        z, info = anderson(f, jnp.zeros((1, d)), m=5, max_iter=40, tol=1e-6)
        return z, info.iterations

    z_solo = [solve(Ms[i], bs[i]) for i in range(2)]
    z_vmap, it_vmap = jax.vmap(solve)(Ms, bs)
    for i in range(2):
        assert int(it_vmap[i]) == int(z_solo[i][1])
        np.testing.assert_allclose(np.asarray(z_vmap[i]),
                                   np.asarray(z_solo[i][0]),
                                   rtol=1e-6, atol=1e-7)


def test_picard_converges(rng):
    M, b = _contraction(rng, rate=0.5)
    f = lambda z, k: z @ jnp.asarray(M).T + jnp.asarray(b)
    z, info = picard(f, jnp.zeros((2, M.shape[0])), max_iter=200, tol=1e-7)
    z_true = np.linalg.solve(np.eye(M.shape[0]) - M, b)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(z_true, z.shape),
                               rtol=1e-4, atol=1e-5)
