"""Real spectral normalization for conv layers (power iteration in
operator space) + BN spectral norm.

Rebuild of the reference's conv-SN machinery
(networks/provable/model/conv_sn_chen.py:16-93, utils/spectral_norm.py:194-345,
bn_sn_chen.py) as a *parameter transform*:

* ``u`` is a feature map (1, S, S, C_out) — the left singular vector of the
  conv operator on an S x S grid (the reference hardcodes 40x40, line 80);
* one power step:  v = normalize(flip(conv(flip(u), W_swapped))),
  u' = normalize(conv(v, W)), sigma = <u', conv(v, W)> — the conv with
  swapped in/out channels on a flipped input is the transpose-conv trick of
  reference lines 39-42;
* normalized weight = W / sigma * sigma_target.

Train/eval semantics: the reference's forward-pre-hook recomputes W_bar and
advances ``u`` on EVERY module call in train mode — i.e. hundreds of times
inside one DEQ solve — and freezes the stored W_bar in eval
(ConvSpectralNorm.__call__, lines 60-67). Here normalization happens once
per *train step* (``normalize_params``), with ``n_power_iterations``
(default 5) compensating for the reduced update frequency; this keeps the
step function pure under jit. Eval uses stored normalized weights, which is
exactly the reference's eval path (and why rsn_cnn.ckpt loads as plain
convs — see io/torch_ckpt.py).

sigma is differentiable w.r.t. the weight (u, v treated as constants),
matching the reference where only ``cur_sigma``'s final contraction carries
gradient (line 48).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.sqrt(jnp.sum(x * x)), eps)


def _conv(x: jnp.ndarray, k_hwio: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.conv_general_dilated(
        x, k_hwio, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=_HI)


def conv_power_step(kernel: jnp.ndarray, u: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One operator-space power iteration. kernel HWIO, u (1, S, S, O).
    Returns (new_u, sigma) with sigma differentiable w.r.t. kernel."""
    k_swap = jnp.swapaxes(kernel, 2, 3)            # transpose-conv kernel
    u_c, k_c = jax.lax.stop_gradient(u), jax.lax.stop_gradient(kernel)
    v = _normalize(jnp.flip(_conv(jnp.flip(u_c, (1, 2)),
                                  jax.lax.stop_gradient(k_swap)), (1, 2)))
    u_new = _normalize(_conv(v, k_c))
    sigma = jnp.sum(u_new * _conv(v, kernel))      # grad flows through here
    return u_new, sigma


def init_u(key, kernel: jnp.ndarray, size: int = 40) -> jnp.ndarray:
    """Random normalized u map (reference init, conv_sn_chen.py:80)."""
    c_out = kernel.shape[-1]
    return _normalize(jax.random.normal(key, (1, size, size, c_out),
                                        kernel.dtype))


def normalize_kernel(kernel: jnp.ndarray, u: jnp.ndarray,
                     sigma_target: float = 1.0, n_power_iterations: int = 5
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Power-iterate, then rescale kernel to spectral norm sigma_target."""
    sigma = None
    for _ in range(max(1, n_power_iterations)):
        u, sigma = conv_power_step(kernel, u)
    return kernel / sigma * sigma_target, u


def init_sn_state(key, params: Dict[str, Any], sigma_targets: Dict[str, float],
                  size: int = 40) -> Dict[str, Any]:
    """Create u maps for every conv named in sigma_targets.

    ``params`` is a flax param tree whose conv entries are
    ``{'kernel': HWIO}``; sigma_targets maps conv names (e.g. 'conv0') to
    target spectral norms (the reference uses lip**(1/L) per layer,
    SimpleCNN_models.py:14-15).
    """
    state = {}
    for i, (name, _) in enumerate(sorted(sigma_targets.items())):
        sub = params[name] if name in params else None
        assert sub is not None, f"no conv named {name} in params"
        state[name] = init_u(jax.random.fold_in(key, i), sub["kernel"], size)
    return state


def normalize_params(params: Dict[str, Any], sn_state: Dict[str, Any],
                     sigma_targets: Dict[str, float],
                     n_power_iterations: int = 5
                     ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Return (normalized params, advanced sn_state). Non-SN entries pass
    through untouched."""
    out = dict(params)
    new_state = dict(sn_state)
    for name, target in sigma_targets.items():
        k_bar, u = normalize_kernel(params[name]["kernel"], sn_state[name],
                                    target, n_power_iterations)
        entry = dict(params[name])
        entry["kernel"] = k_bar
        out[name] = entry
        new_state[name] = jax.lax.stop_gradient(u)
    return out, new_state


def percall_sigma_schedule(kernel: jnp.ndarray, u: jnp.ndarray,
                           n_calls: int, n_power_iterations: int = 1
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The sigma sequence the reference's train-mode hook produces.

    The hook advances ``u`` by ``n_power_iterations`` (default 1) on EVERY
    module call (utils/spectral_norm.py:268-275) — hundreds of times inside
    one DEQ solve. Weights are constant within a solve, so the per-call
    sequence is a pure function of (kernel, u0): sigma_k after k+1 hook
    firings. Returns (sigmas (n_calls,), final u). Each sigma is
    differentiable w.r.t. kernel with u, v as constants, matching the
    reference where only ``cur_sigma``'s final contraction carries grad.
    """
    def body(u, _):
        sigma = None
        for _i in range(max(1, n_power_iterations)):
            u, sigma = conv_power_step(kernel, u)
        return u, sigma

    u_final, sigmas = jax.lax.scan(body, u, None, length=n_calls)
    return sigmas, u_final


def make_percall_sn_step(base_step, sigma_targets: Dict[str, float],
                         max_calls: int, n_power_iterations: int = 1):
    """Per-call SN mode — the reference's exact train-mode hook semantics.

    The returned ``step(aug_params, z, k, args)`` applies ``base_step`` with
    weights normalized by the k-th sigma of the per-call power-iteration
    sequence (one iteration per module call, as the forward-pre-hook fires:
    utils/spectral_norm.py:268-275). Precomputing the schedule with one
    ``lax.scan`` is call-for-call equivalent to threading u through the
    solve (weights are constant within a solve) while keeping the solver
    carry pure and the step closure tracer-free for ``jax.custom_vjp``.

    Returns ``(step, prepare)``. Inside the loss function call
    ``aug_params, new_state = prepare(params, sn_state)`` and pass
    ``aug_params`` as the DEQ's params — gradients then flow into
    ``params`` both directly and through each sigma (the reference's
    ``cur_sigma`` grad path, utils/spectral_norm.py:253-258).
    """

    def prepare(params: Dict[str, Any], sn_state: Dict[str, Any]
                ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
        sigmas: Dict[str, jnp.ndarray] = {}
        new_state: Dict[str, Any] = dict(sn_state)
        for name, _t in sigma_targets.items():
            s, u = percall_sigma_schedule(
                params[name]["kernel"], sn_state[name], max_calls,
                n_power_iterations)
            sigmas[name] = s
            new_state[name] = jax.lax.stop_gradient(u)
        return {"raw": params, "sigmas": sigmas}, new_state

    def step(aug, z, k, args):
        params, sigmas = aug["raw"], aug["sigmas"]
        kc = jnp.minimum(k, max_calls - 1)
        out = dict(params)
        for name, target in sigma_targets.items():
            entry = dict(params[name])
            entry["kernel"] = (params[name]["kernel"]
                               / sigmas[name][kc] * target)
            out[name] = entry
        return base_step(out, z, k, args)

    return step, prepare


def simplecnn_sigma_targets(lip: float, num_layers: int = 4
                            ) -> Dict[str, float]:
    """Per-layer targets sigma_i = lip**(1/L) (SimpleCNN_models.py:14-15)."""
    s = lip ** (1.0 / num_layers)
    return {f"conv{i}": s for i in range(num_layers)}


def bn_spectral_norm(scale: jnp.ndarray, var: jnp.ndarray,
                     sigma_target: float = 1.0,
                     eps: float = 1e-5) -> jnp.ndarray:
    """BN-SN: rescale gamma so max |gamma| / sqrt(var+eps) <= sigma_target
    (bn_sn_chen.py:9-72 semantics: sigma = max(|gamma|/sqrt(var)), clamp to
    target when it exceeds it)."""
    sigma = jnp.max(jnp.abs(scale) / jnp.sqrt(var + eps))
    factor = jnp.where(sigma > sigma_target, sigma_target / sigma, 1.0)
    return scale * factor
