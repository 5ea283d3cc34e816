"""Generic maps + unrolled baselines + ADMM-SCI + spectral norm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.maps.admm import make_admm_step
from deqsci_tpu.maps.admm_sci import make_admm_sci_step
from deqsci_tpu.maps.proxgrad import (make_douglas_rachford_step,
                                      make_grad_step, make_proxgrad_step)
from deqsci_tpu.maps.unrolled import (make_grad_net, make_precond_neumann_net,
                                      make_proxgrad_net)
from deqsci_tpu.ops.blur import gaussian_blur
from deqsci_tpu.ops.sensing import A, initial_point_admm, phi_sum


def _zero_denoiser():
    return lambda net, x: jnp.zeros_like(x)


def _small_denoiser(scale=0.05):
    # weak linear "denoiser" keeps the maps contractive
    return lambda net, x: -scale * x


@pytest.fixture
def blur_problem(rng):
    op = gaussian_blur(1.0, 5)
    x = jnp.asarray(rng.random((2, 16, 16, 1)).astype(np.float32)) * 2 - 1
    y = op.forward(x)
    return op, x, y


@pytest.mark.parametrize("maker", [make_grad_step, make_proxgrad_step,
                                   make_douglas_rachford_step])
def test_generic_maps_fixed_point_improves(blur_problem, maker):
    """With a weak denoiser the DEQ solve should reduce data misfit
    relative to the adjoint init."""
    op, x_true, y = blur_problem
    step = maker(op, _small_denoiser())
    params = {"eta": jnp.float32(0.5), "net": {}}
    deq = make_deq(step, m=5, lam=1e-2, max_iter=60, tol=1e-6)
    z0 = op.adjoint(y)
    z = deq(params, z0, y)
    err0 = float(jnp.linalg.norm(op.forward(z0) - y))
    err = float(jnp.linalg.norm(op.forward(z) - y))
    assert np.isfinite(err)
    assert err < err0


@pytest.mark.parametrize("variant", ["admm", "admm2", "admm_minus",
                                     "admm_plus"])
def test_admm_variants_run(blur_problem, variant):
    op, x_true, y = blur_problem
    step = make_admm_step(op, _small_denoiser(), variant=variant,
                          max_cg_iterations=5)
    params = {"net": {}}
    carry = (op.adjoint(y), jnp.zeros_like(op.adjoint(y)))
    out = step(params, carry, jnp.int32(0), y)
    assert out[0].shape == carry[0].shape
    deq = make_deq(step, m=5, lam=1e-2, max_iter=20, tol=1e-5)
    z, u = deq(params, carry, y)
    assert np.isfinite(np.asarray(z)).all()


def test_admm_sci_through_deq(rng):
    h = w = 16
    t = 8
    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)
    step = make_admm_sci_step(_small_denoiser(), tag="denoiser")
    deq = make_deq(step, m=5, lam=1e-2, max_iter=30, tol=1e-5)
    carry0 = initial_point_admm(y, Phi)
    z, u = deq({}, carry0, (y, Phi, ps))
    err0 = float(jnp.linalg.norm(A(carry0[0], Phi) - y))
    err = float(jnp.linalg.norm(A(z, Phi) - y))
    assert err < err0


def test_admm_sci_ffdnet_sigma_schedule(rng):
    """The ADMM map's 'ffdnet' tag applies the SAME per-call-index sigma
    schedule as the GAP map (60/255 x 0.971^k, optional floor) — the
    reference ADMM map has no sigma path at all
    (equilibrium_solvers_yaping.py:455-462), so this is schedule parity
    against the GAP semantics, not a torch oracle."""
    h = w = 16
    t = 8
    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)

    seen = []

    def spy_denoise(params, x, sigma):
        seen.append(np.asarray(sigma))
        return jnp.zeros_like(x)

    step = make_admm_sci_step(spy_denoise, tag="ffdnet")
    carry = initial_point_admm(y, Phi)
    for k in (0, 1, 7, 179):
        step({}, carry, jnp.int32(k), (y, Phi, ps))
        expect = 60.0 / 255.0 * 0.971 ** k
        np.testing.assert_allclose(seen[-1], expect, rtol=1e-5)
        assert seen[-1].shape == (t,)  # one sigma per unpacked frame

    # floor variant
    seen.clear()
    step = make_admm_sci_step(spy_denoise, tag="ffdnet", sigma_min=0.1)
    step({}, carry, jnp.int32(179), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 0.1, rtol=1e-6)

    # residual semantics: zero noise estimate => z_new == zbar - u, so the
    # dual update vanishes and the carry stays consistent
    zbar, u_new = step({}, carry, jnp.int32(0), (y, Phi, ps))
    z0, u0 = carry
    np.testing.assert_allclose(np.asarray(u_new), np.asarray(u0) -
                               np.asarray(u0), atol=1e-6)


def test_admm_sci_dual_sigma_floor(rng):
    """sigma_dual_coef floors the schedule at coef*RMS(dual): large duals
    keep the denoiser strong, the floor anneals as the splitting agrees
    (self-tuning ADMM curriculum — no upstream analog; VERDICT r3 #6)."""
    h = w = 16
    t = 8
    b = 2
    Phi = jnp.asarray((rng.random((b, h, w, t)) > 0.5).astype(np.float32))
    gt = jnp.asarray(rng.random((b, h, w, t)).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)

    seen = []

    def spy_denoise(params, x, sigma):
        seen.append(np.asarray(sigma))
        return jnp.zeros_like(x)

    coef = 2.0
    step = make_admm_sci_step(spy_denoise, tag="ffdnet",
                              sigma_dual_coef=coef)
    z0 = jnp.asarray(rng.random((b, h, w, t)).astype(np.float32))
    u0 = jnp.asarray(rng.standard_normal((b, h, w, t)).astype(np.float32))
    u0 = u0.at[1].multiply(3.0)  # distinct per-sample dual magnitudes

    # late call index: the schedule term is ~0, the dual floor dominates
    step({}, (z0, u0), jnp.int32(500), (y, Phi, ps))
    rms = np.sqrt(np.mean(np.asarray(u0) ** 2, axis=(1, 2, 3)))
    expect = np.repeat(coef * rms, t)  # sample-major, one sigma per frame
    np.testing.assert_allclose(seen[-1], expect, rtol=1e-4)

    # early call index with a tiny dual: the schedule term dominates
    step({}, (z0, u0 * 1e-6), jnp.int32(0), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 60.0 / 255.0, rtol=1e-5)

    # coef=None keeps exact reference-GAP schedule semantics
    seen.clear()
    step_plain = make_admm_sci_step(spy_denoise, tag="ffdnet")
    step_plain({}, (z0, u0), jnp.int32(3), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 60.0 / 255.0 * 0.971 ** 3,
                               rtol=1e-5)


@pytest.mark.parametrize("maker", [make_proxgrad_net, make_grad_net,
                                   make_precond_neumann_net])
def test_unrolled_nets_run_and_differentiate(blur_problem, maker):
    op, x_true, y = blur_problem
    net = maker(op, _small_denoiser())
    params = {"eta": jnp.float32(0.1), "net": {}}
    out = net(params, y, 6)
    assert out.shape == y.shape
    g = jax.grad(lambda p: jnp.sum(net(p, y, 6) ** 2))(params)
    assert np.isfinite(float(g["eta"]))


def test_spectral_norm_power_iteration_against_ckpt():
    """From rsn_cnn.ckpt's (weight_orig, weight_u), one power step must
    reproduce the stored normalized weight (u was converged at save)."""
    import os
    from tests.conftest import REFERENCE_ROOT, has_reference
    if not has_reference():
        pytest.skip("no reference checkout")
    from deqsci_tpu.io.torch_ckpt import conv_kernel, load_solver_state
    from deqsci_tpu.nets.sn import conv_power_step

    sd = load_solver_state(os.path.join(REFERENCE_ROOT,
                                        "models/rsn_cnn.ckpt"))
    for idx in (0, 2, 4, 6):
        w_orig = conv_kernel(sd[f"nonlinear_op.dncnn.{idx}.weight_orig"])
        w_bar = conv_kernel(sd[f"nonlinear_op.dncnn.{idx}.weight"])
        # torch u is (1, C_out, 40, 40) NCHW -> NHWC
        u = np.transpose(sd[f"nonlinear_op.dncnn.{idx}.weight_u"],
                         (0, 2, 3, 1))
        _, sigma = conv_power_step(jnp.asarray(w_orig), jnp.asarray(u))
        got = np.asarray(w_orig) / float(sigma)  # sigma_target = 1
        np.testing.assert_allclose(got, w_bar, rtol=2e-2, atol=2e-3)


def test_sn_normalize_params_reduces_spectral_norm(rng):
    from deqsci_tpu.nets.sn import (init_sn_state, normalize_params,
                                    simplecnn_sigma_targets)
    params = {f"conv{i}": {"kernel": jnp.asarray(
        rng.standard_normal((3, 3, 8, 8)).astype(np.float32))}
        for i in range(2)}
    targets = simplecnn_sigma_targets(1.0, 2)
    state = init_sn_state(jax.random.key(0), params, targets, size=16)
    normed, state2 = normalize_params(params, state, targets,
                                      n_power_iterations=20)
    from deqsci_tpu.nets.sn import conv_power_step
    for name in targets:
        _, sigma = conv_power_step(normed[name]["kernel"], state2[name])
        np.testing.assert_allclose(float(sigma), 1.0, rtol=5e-2)


def test_admm_sci_horizon_freeze_composition(rng):
    """The past-horizon tail fix (round 5): sigma_min = sigma0*decay^K
    freezes the schedule at its iteration-K value, so (a) every call with
    k <= K sees the UNCHANGED schedule value (bit-identical iterates below
    the freeze point — the curve knee cannot move), (b) calls past K see
    the constant sigma_K (the map becomes autonomous), and (c) the
    dual-RMS floor still composes on top: sigma = max(frozen_sched,
    coef*RMS(u))."""
    h = w = 16
    t = 8
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)
    carry = initial_point_admm(y, Phi)

    seen = []

    def spy(params, x, sigma):
        seen.append(np.asarray(sigma))
        return jnp.zeros_like(x)

    K = 180
    s0, dec = 60.0 / 255.0, 0.971
    smin = s0 * dec ** K
    frozen = make_admm_sci_step(spy, tag="ffdnet", sigma_min=smin)
    plain = make_admm_sci_step(spy, tag="ffdnet")

    for k in (0, 50, 179):  # (a) below the freeze point: identical
        frozen({}, carry, jnp.int32(k), (y, Phi, ps))
        ref = seen[-1]
        plain({}, carry, jnp.int32(k), (y, Phi, ps))
        np.testing.assert_array_equal(ref, seen[-1])

    frozen({}, carry, jnp.int32(260), (y, Phi, ps))  # (b) frozen past K
    np.testing.assert_allclose(seen[-1], smin, rtol=1e-6)

    # (c) composes with the dual floor: big dual still dominates
    both = make_admm_sci_step(spy, tag="ffdnet", sigma_min=smin,
                              sigma_dual_coef=1.0)
    z0, _ = carry
    u_big = jnp.full_like(z0, 0.25)
    both({}, (z0, u_big), jnp.int32(260), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 0.25, rtol=1e-4)


def test_admm_sci_sigma_cap(rng):
    """sigma_max caps the EFFECTIVE sigma after both floors (round-5 tail
    fix): the dual-trace diagnostic showed RMS(u) grows monotonically
    along the solve, so sigma_eff = coef*RMS(u) over-smooths late
    iterations; the cap pins the denoiser strength at the knee-region
    value while leaving early iterations (RMS below the cap) untouched."""
    h = w = 16
    t = 8
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)
    z0, _ = initial_point_admm(y, Phi)

    seen = []

    def spy(params, x, sigma):
        seen.append(np.asarray(sigma))
        return jnp.zeros_like(x)

    cap = 0.08
    step = make_admm_sci_step(spy, tag="ffdnet", sigma_dual_coef=1.0,
                              sigma_max=cap)

    # big dual (RMS 0.25 > cap): sigma pinned at the cap
    step({}, (z0, jnp.full_like(z0, 0.25)), jnp.int32(200), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], cap, rtol=1e-6)

    # small dual (RMS 0.02 < cap), late k: dual floor passes through
    step({}, (z0, jnp.full_like(z0, 0.02)), jnp.int32(200), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 0.02, rtol=1e-4)

    # early k: schedule dominates and sits below the cap -> untouched
    step({}, (z0, jnp.full_like(z0, 1e-6)), jnp.int32(30), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 60.0 / 255.0 * 0.971 ** 30,
                               rtol=1e-5)

    # cap=None (default) keeps prior semantics exactly
    seen.clear()
    plain = make_admm_sci_step(spy, tag="ffdnet", sigma_dual_coef=1.0)
    plain({}, (z0, jnp.full_like(z0, 0.25)), jnp.int32(200), (y, Phi, ps))
    np.testing.assert_allclose(seen[-1], 0.25, rtol=1e-4)
