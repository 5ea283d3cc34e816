"""Classical baselines: TV-Chambolle vs numpy oracle, GAP-TV/ADMM-TV runs."""

import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.classical import (admm_tv_rec, denoise_tv_chambolle,
                                      gap_tv_rec)
from deqsci_tpu.ops.sensing import A, phi_sum


def tv_chambolle_oracle(im, weight=0.1, n_iter_max=30, eps=2e-4):
    """Numpy restatement of skimage's _denoise_tv_chambolle_nd (2-D)."""
    p = np.zeros((2,) + im.shape, im.dtype)
    tau = 1.0 / 4.0
    i = 0
    E_init = E_prev = 0.0
    out = im.copy()
    while i < n_iter_max:
        if i > 0:
            # divergence of p
            d = np.zeros_like(im)
            px, py = p[0], p[1]
            dx = px.copy()
            dx[1:] -= px[:-1]
            dx[-1] = -px[-2]
            dy = py.copy()
            dy[:, 1:] -= py[:, :-1]
            dy[:, -1] = -py[:, -2]
            d = -(dx + dy)
            out = im + d
            E = (d ** 2).sum()
        else:
            out = im
            E = 0.0
        g = np.zeros((2,) + im.shape, im.dtype)
        g[0, :-1] = np.diff(out, axis=0)
        g[1, :, :-1] = np.diff(out, axis=1)
        norm = np.sqrt((g ** 2).sum(axis=0))
        E = (E + weight * norm.sum()) / im.size
        denom = 1.0 + (tau / weight) * norm
        p = (p - tau * g) / denom[None]
        if i == 0:
            E_init = E
            E_prev = E
        else:
            if abs(E_prev - E) < eps * E_init:
                break
            E_prev = E
        i += 1
    # skimage returns the out of the last executed iteration (the dual is
    # one update ahead)
    return out


def test_tv_matches_oracle(rng):
    im = rng.random((24, 24)).astype(np.float32)
    got = np.asarray(denoise_tv_chambolle(jnp.asarray(im), 0.15, 30))
    want = tv_chambolle_oracle(im, 0.15, 30)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_tv_denoises(rng):
    clean = np.zeros((32, 32), np.float32)
    clean[8:24, 8:24] = 1.0
    noisy = clean + 0.1 * rng.standard_normal((32, 32)).astype(np.float32)
    den = np.asarray(denoise_tv_chambolle(jnp.asarray(noisy), 0.1))
    assert np.mean((den - clean) ** 2) < np.mean((noisy - clean) ** 2)


def test_gap_tv_and_admm_tv_improve(rng):
    h = w = 32
    t = 8
    gt = np.zeros((1, h, w, t), np.float32)
    gt[:, 8:24, 8:24, :] = np.linspace(0.3, 1.0, t)
    Phi = (rng.random((1, h, w, t)) > 0.5).astype(np.float32)
    gt_j, Phi_j = jnp.asarray(gt), jnp.asarray(Phi)
    y = A(gt_j, Phi_j)
    ps = phi_sum(Phi_j)

    init_err = float(jnp.linalg.norm(y[..., None] * Phi_j - gt_j))
    for rec_fn in (gap_tv_rec, admm_tv_rec):
        rec = rec_fn(y, Phi_j, ps, maxiter=20, tv_weight=0.1)
        err = float(jnp.linalg.norm(jnp.clip(rec, 0, 1) - gt_j))
        assert np.isfinite(err)
        assert err < init_err
