"""Spectral-norm training integration: Lipschitz control maintained while
training a RealSN-SimpleCNN through the DEQ (the reference's training mode,
where conv-SN runs as a forward-pre-hook — here a per-step transform)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
import optax

from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.maps.gap_sci import make_gap_sci_step
from deqsci_tpu.nets.dncnn import DnCNN
from deqsci_tpu.nets.sn import (conv_power_step, init_sn_state,
                                normalize_params, simplecnn_sigma_targets)
from deqsci_tpu.ops.sensing import A, initial_point, phi_sum


@pytest.mark.slow
def test_sn_deq_training_keeps_lipschitz(rng):
    h = w = 16
    t = 8
    net = DnCNN(features=16, num_layers=3, use_bn=False, fast_head=False)
    variables = net.init(jax.random.key(0), jnp.zeros((1, h, w, 1)))
    params = variables["params"]
    targets = simplecnn_sigma_targets(1.0, 3)
    sn_state = init_sn_state(jax.random.key(5), params, targets, size=16)

    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)

    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(params)

    def step_fn(p_bar, z, k, args):
        yy, PP, pp = args
        from deqsci_tpu.ops.sensing import gap_update
        z = gap_update(z, yy, PP, pp)
        from deqsci_tpu.maps.gap_sci import batch_to_frames, frames_to_batch
        noise = net.apply({"params": p_bar}, frames_to_batch(z))
        return z - batch_to_frames(noise, z.shape[0])

    deq = make_deq(step_fn, m=5, lam=1e-2, max_iter=8, tol=1e-6)

    @jax.jit
    def train_step(params, sn_state, opt_state):
        def loss_fn(p, state):
            p_bar, state = normalize_params(p, state, targets,
                                            n_power_iterations=3)
            z0 = jax.lax.stop_gradient(initial_point(y, Phi))
            rec = deq(p_bar, z0, (y, Phi, ps))
            return jnp.mean((rec - gt) ** 2), state

        (loss, sn_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, sn_state)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), sn_state, \
            opt_state, loss

    losses = []
    for _ in range(6):
        params, sn_state, opt_state, loss = train_step(params, sn_state,
                                                       opt_state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # after training, the normalized weights must have spectral norm ~1
    p_bar, state = normalize_params(params, sn_state, targets,
                                    n_power_iterations=25)
    for name in targets:
        u, sigma = conv_power_step(p_bar[name]["kernel"], state[name])
        for _ in range(10):
            u, sigma = conv_power_step(p_bar[name]["kernel"], u)
        np.testing.assert_allclose(float(sigma), 1.0, rtol=5e-2)


def test_percall_sn_matches_converged_sigma(rng):
    """The per-call sigma schedule (reference hook semantics) converges to
    the true spectral norm within a few calls, and its tail agrees with the
    hoisted normalize_params sigma."""
    from deqsci_tpu.nets.sn import (init_u, normalize_kernel,
                                    percall_sigma_schedule)
    k = jnp.asarray(rng.standard_normal((3, 3, 4, 4)).astype(np.float32))
    u0 = init_u(jax.random.key(1), k, size=16)
    sigmas, _u = percall_sigma_schedule(k, u0, n_calls=40)
    # hoisted: 30 compensating iterations -> converged sigma
    k_bar, _ = normalize_kernel(k, u0, sigma_target=1.0,
                                n_power_iterations=30)
    sigma_conv = float(jnp.max(jnp.abs(k / k_bar)))
    assert abs(float(sigmas[-1]) - sigma_conv) / sigma_conv < 1e-2
    # late sigmas stable to 1%
    tail = np.asarray(sigmas[-10:])
    assert np.ptp(tail) / tail.mean() < 1e-2


def test_percall_sn_step_trains(rng):
    """A DEQ train step in per-call SN mode (make_percall_sn_step) is
    finite, reduces loss, and stays close to the hoisted mode's loss."""
    from deqsci_tpu.nets.sn import make_percall_sn_step
    h = w = 16
    t = 8
    net = DnCNN(features=16, num_layers=3, use_bn=False, fast_head=False)
    variables = net.init(jax.random.key(0), jnp.zeros((1, h, w, 1)))
    params0 = variables["params"]
    targets = simplecnn_sigma_targets(1.0, 3)
    sn_state0 = init_sn_state(jax.random.key(5), params0, targets, size=16)

    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)
    max_iter = 8

    from deqsci_tpu.maps.gap_sci import batch_to_frames, frames_to_batch
    from deqsci_tpu.ops.sensing import gap_update

    def base_step(p_bar, z, k, args):
        yy, PP, pp = args
        z = gap_update(z, yy, PP, pp)
        noise = net.apply({"params": p_bar}, frames_to_batch(z))
        return z - batch_to_frames(noise, z.shape[0])

    deq = make_deq(base_step, m=5, lam=1e-2, max_iter=max_iter, tol=1e-6)
    pc_step, pc_prepare = make_percall_sn_step(base_step, targets,
                                               max_calls=max_iter + 2)
    pc_deq = make_deq(pc_step, m=5, lam=1e-2, max_iter=max_iter, tol=1e-6)

    def make_train(mode):
        optimizer = optax.adam(1e-3)

        @jax.jit
        def train_step(params, sn_state, opt_state):
            def loss_fn(p, state):
                z0 = jax.lax.stop_gradient(initial_point(y, Phi))
                if mode == "percall":
                    aug, state = pc_prepare(p, state)
                    rec = pc_deq(aug, z0, (y, Phi, ps))
                else:
                    p_bar, state = normalize_params(p, state, targets,
                                                    n_power_iterations=5)
                    rec = deq(p_bar, z0, (y, Phi, ps))
                return jnp.mean((rec - gt) ** 2), state

            (loss, sn_state), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, sn_state)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), sn_state, \
                opt_state, loss

        return train_step, optimizer

    results = {}
    for mode in ("percall", "hoisted"):
        train_step, optimizer = make_train(mode)
        params, sn_state = params0, sn_state0
        opt_state = optimizer.init(params)
        losses = []
        for _ in range(5):
            params, sn_state, opt_state, loss = train_step(
                params, sn_state, opt_state)
            losses.append(float(loss))
        results[mode] = losses
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
    # After the first step (power-iteration burn-in from the random u0 —
    # a transient both schemes have, resolved differently), the two modes
    # follow the same trajectory: measured deltas [.0042, .0005, .0007,
    # .0012] on losses ~0.2 (see PARITY.md SN-mode section).
    a, b = np.asarray(results["percall"]), np.asarray(results["hoisted"])
    assert np.abs(a[1:] - b[1:]).max() / b[0] < 0.02, (a, b)
