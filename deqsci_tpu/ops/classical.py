"""Classical (learning-free) SCI baselines: TV denoising, GAP-TV, ADMM-TV.

Rebuild of the reference's numpy/skimage baselines on jnp:

* ``denoise_tv_chambolle`` — Chambolle's dual projection algorithm with
  skimage semantics (the reference's prior, utils/cg_utils.py:148,201,220):
  tau = 1/(2*ndim), dual update p <- (p - tau*grad(out)) / (1 + tau/weight
  * |grad|), energy-based early exit at eps=2e-4, multichannel = per-channel
  independence (vmapped over the frame axis);
* ``gap_tv_rec`` — GAP iteration with accumulated measurement residual
  y1 (utils/cg_utils.py:207-224);
* ``admm_tv_rec`` — ADMM iteration with decaying tv_weight (x0.999) and
  eta (x0.998) per step (utils/cg_utils.py:132-154).

All run as single jitted programs (lax loops), so the classical baselines
get the same single-program treatment as the learned ones.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from deqsci_tpu.ops.sensing import A, At


def _tv_single(im: jnp.ndarray, weight: float, n_iter_max: int,
               eps: float = 2e-4) -> jnp.ndarray:
    """Chambolle TV on one 2-D image."""
    ndim = 2
    tau = 1.0 / (2.0 * ndim)

    def grad(o):
        gx = jnp.zeros_like(o).at[:-1, :].set(o[1:, :] - o[:-1, :])
        gy = jnp.zeros_like(o).at[:, :-1].set(o[:, 1:] - o[:, :-1])
        return jnp.stack([gx, gy])

    def d_of(p):
        # skimage's d: -p.sum(0) with shifted re-additions
        px, py = p[0], p[1]
        dx = px - jnp.concatenate([jnp.zeros_like(px[:1]), px[:-1]], 0)
        dy = py - jnp.concatenate([jnp.zeros_like(py[:, :1]), py[:, :-1]], 1)
        return -(dx + dy)

    p0 = jnp.zeros((ndim,) + im.shape, im.dtype)

    def body(c):
        i, p, out, e_init, e_prev, done = c
        d = d_of(p)
        out_new = jnp.where(i > 0, im + d, im)
        e = jnp.where(i > 0, jnp.sum(d * d), 0.0)
        g = grad(out_new)
        norm = jnp.sqrt(jnp.sum(g * g, axis=0))
        e = (e + weight * jnp.sum(norm)) / im.size
        denom = 1.0 + (tau / weight) * norm
        p_new = (p - tau * g) / denom[None]
        conv = jnp.logical_and(i > 0, jnp.abs(e_prev - e) < eps * e_init)
        e_init = jnp.where(i == 0, e, e_init)
        # skimage returns the out computed at the top of the last executed
        # iteration (the dual is one update ahead of the returned image)
        out = jnp.where(done, out, out_new)
        p = jnp.where(done, p, p_new)
        done = jnp.logical_or(done, conv)
        return i + 1, p, out, e_init, e, done

    def cond(c):
        i, done = c[0], c[-1]
        return jnp.logical_and(i < n_iter_max, jnp.logical_not(done))

    _, _, out, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), p0, im, jnp.float32(0.0),
                     jnp.float32(0.0), jnp.array(False)))
    return out


def denoise_tv_chambolle(im: jnp.ndarray, weight: float = 0.1,
                         n_iter_max: int = 30) -> jnp.ndarray:
    """(H, W) or multichannel (H, W, C): per-channel TV (skimage
    ``multichannel=True`` semantics)."""
    if im.ndim == 2:
        return _tv_single(im, weight, n_iter_max)
    return jax.vmap(lambda x: _tv_single(x, weight, n_iter_max),
                    in_axes=-1, out_axes=-1)(im)


@partial(jax.jit, static_argnames=("maxiter",))
def gap_tv_rec(y: jnp.ndarray, Phi: jnp.ndarray, Phi_sum: jnp.ndarray,
               maxiter: int = 40, step_size: float = 1.0,
               tv_weight: float = 0.3) -> jnp.ndarray:
    """GAP-TV with accumulated residual (batched (B, H, W) / (B, H, W, T))."""
    f0 = At(y, Phi)
    y1_0 = jnp.zeros_like(y)

    def body(c, _):
        f, y1 = c
        fb = A(f, Phi)
        y1 = y1 + (y - fb)
        f = f + step_size * At((y1 - fb) / Phi_sum, Phi)
        f = jax.vmap(lambda v: denoise_tv_chambolle(v, tv_weight))(f)
        return (f, y1), None

    (f, _), _ = jax.lax.scan(body, (f0, y1_0), None, length=maxiter)
    return f


@partial(jax.jit, static_argnames=("maxiter",))
def admm_tv_rec(y: jnp.ndarray, Phi: jnp.ndarray, Phi_sum: jnp.ndarray,
                maxiter: int = 40, step_size: float = 1.0,
                tv_weight: float = 0.3, eta: float = 1e-8) -> jnp.ndarray:
    """ADMM-TV with per-step decaying tv_weight/eta."""
    theta0 = At(y, Phi)
    b0 = jnp.zeros_like(theta0)

    def body(c, _):
        theta, b, w, e = c
        yb = A(theta + b, Phi)
        v = (theta + b) + step_size * At((y - yb) / (Phi_sum + e), Phi)
        theta = jax.vmap(lambda x, ww: denoise_tv_chambolle(x, ww),
                         in_axes=(0, None))(v - b, w)
        b = b - (v - theta)
        return (theta, b, w * 0.999, e * 0.998), v

    (_, _, _, _), vs = jax.lax.scan(
        body, (theta0, b0, jnp.float32(tv_weight), jnp.float32(eta)),
        None, length=maxiter)
    return vs[-1]
