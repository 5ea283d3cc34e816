"""Training loop: step correctness, StepLR schedule, NaN-reset recovery."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.maps.gap_sci import make_gap_sci_step
from deqsci_tpu.nets.dncnn import DnCNN
from deqsci_tpu.ops.sensing import A
from deqsci_tpu.train.loop import (make_optimizer, make_train_step, steplr,
                                   train_solver_sci)


def _tiny_problem(rng, n=3, h=16, w=16, t=8):
    net = DnCNN(features=8, num_layers=3, use_bn=False)
    variables = net.init(jax.random.key(0), jnp.zeros((1, h, w, 1)))
    step = make_gap_sci_step(lambda p, x: net.apply(p, x), tag="denoiser")
    deq = make_deq(step, m=5, lam=1e-2, max_iter=8, tol=1e-6)

    samples = []
    for _ in range(n):
        gt = rng.random((h, w, t)).astype(np.float32)
        Phi = (rng.random((h, w, t)) > 0.5).astype(np.float32)
        y = np.asarray(A(jnp.asarray(gt)[None], jnp.asarray(Phi)[None]))[0]
        samples.append({"gt": gt, "meas": y, "mask": Phi})
    return deq, variables, samples


def test_train_step_reduces_loss(rng):
    deq, params, samples = _tiny_problem(rng)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(params)
    train_step = make_train_step(deq, optimizer)

    s = samples[0]
    gt = jnp.asarray(s["gt"])[None]
    y = jnp.asarray(s["meas"])[None]
    Phi = jnp.asarray(s["mask"])[None]

    losses = []
    for _ in range(8):
        params, opt_state, loss, _ = train_step(params, opt_state, gt, y, Phi)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_steplr_schedule():
    lr = steplr(1e-4, 10, 0.9)
    assert lr(0) == 1e-4
    assert lr(9) == 1e-4
    np.testing.assert_allclose(lr(10), 9e-5)
    np.testing.assert_allclose(lr(25), 1e-4 * 0.9 ** 2)


def test_full_loop_runs_and_checkpoints(rng, tmp_path):
    deq, params, samples = _tiny_problem(rng, n=2)
    saved = {}

    def save_fn(tag, snapshot):
        saved[tag] = snapshot

    evals = []

    def eval_fn(p):
        evals.append(1)
        return float(len(evals))  # strictly improving -> exercises best-ckpt

    out = train_solver_sci(deq, params, samples, n_epochs=2, base_lr=1e-3,
                           eval_fn=eval_fn, save_fn=save_fn,
                           save_every_n_steps=1, print_every_n_steps=100)
    assert "epoch_0" in saved and "epoch_1" in saved
    assert "best" in saved
    assert out["best_psnr"] > 0


def test_admm_passthrough_gradient_is_zero(rng):
    """Documents the round-2 finding: the reference's hook-disabled
    DEQFixedPointADMM backward (passthrough) has EXACTLY zero parameter
    gradient, because the extracted output component is the pre-denoise
    physics update of stop-gradded fixed-point state — which is why the
    reference could never have trained its ADMM config (PARITY.md)."""
    import jax
    import jax.numpy as jnp

    from deqsci_tpu.fp.deq import make_deq
    from deqsci_tpu.maps.admm_sci import make_admm_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.ops.sensing import A, initial_point_admm, phi_sum

    h = w = 16
    t = 8
    net = DnCNN(features=8, num_layers=3, use_bn=False)
    variables = net.init(jax.random.key(0), jnp.zeros((1, h, w, 1)))
    step = make_admm_sci_step(lambda p, x: net.apply(p, x), tag="denoiser")
    deq = make_deq(step, m=5, lam=1e-2, max_iter=6, tol=1e-7,
                   backward="passthrough")

    gt = jnp.asarray(rng.random((1, h, w, t)).astype(np.float32))
    Phi = jnp.asarray((rng.random((1, h, w, t)) > 0.5).astype(np.float32))
    y = A(gt, Phi)
    ps = phi_sum(Phi)

    def loss(v):
        z0 = initial_point_admm(y, Phi)
        zbar, _u = deq(v, z0, (y, Phi, ps))
        return jnp.mean((zbar - gt) ** 2)

    g = jax.grad(loss)(variables)
    total = sum(float(jnp.sum(jnp.abs(x)))
                for x in jax.tree_util.tree_leaves(g))
    assert total == 0.0

    # ... while the neumann backward (what scripts/train_admm_r2.py uses)
    # carries real signal through the same map:
    deq_n = make_deq(step, m=5, lam=1e-2, max_iter=6, tol=1e-7,
                     backward="neumann", neumann_k=5)

    def loss_n(v):
        z0 = initial_point_admm(y, Phi)
        zbar, _u = deq_n(v, z0, (y, Phi, ps))
        return jnp.mean((zbar - gt) ** 2)

    gn = jax.grad(loss_n)(variables)
    total_n = sum(float(jnp.sum(jnp.abs(x)))
                  for x in jax.tree_util.tree_leaves(gn))
    assert total_n > 0.0


def test_grad_clip_optimizer_bounds_update():
    import jax
    import jax.numpy as jnp
    import optax

    from deqsci_tpu.train.loop import make_optimizer

    params = {"w": jnp.zeros((4,))}
    huge = {"w": jnp.full((4,), 1e8)}
    opt = make_optimizer(1.0, grad_clip=1.0)
    st = opt.init(params)
    updates, _ = opt.update(huge, st, params)
    # clipped to global norm 1 before Adam; the Adam step is bounded ~lr
    assert float(jnp.max(jnp.abs(updates["w"]))) < 10.0
    # lr injection still works
    assert "learning_rate" in st.hyperparams


def test_small_sigma_mixture_emphasizes_tiny_sigmas():
    import jax
    import jax.numpy as jnp

    from deqsci_tpu.train.denoiser import small_sigma_mixture

    sample = small_sigma_mixture(sigma_max=75.0 / 255.0, frac_small=0.5)
    s = np.asarray(sample(jax.random.key(0), 4000, jnp.float32))
    assert s.min() >= 0.0 and s.max() <= 75.0 / 255.0 + 1e-6
    # uniform sampling puts ~2.7% below 2/255; the mixture puts >15% there
    frac_tiny = float(np.mean(s < 2.0 / 255.0))
    assert frac_tiny > 0.15


def test_skip_loss_threshold_discards_outlier_updates(rng):
    """skip_loss_threshold (round-3 extension): a batch whose loss exceeds
    the threshold must leave the parameters untouched; normal batches
    still train. Built by scaling one sample's measurement 100x (a
    diverged-solve stand-in)."""
    deq, params, samples = _tiny_problem(rng, n=2)
    samples[1] = dict(samples[1], meas=samples[1]["meas"] * 100.0)

    out = train_solver_sci(deq, params, samples, n_epochs=1, base_lr=1e-3,
                           print_every_n_steps=100,
                           skip_loss_threshold=0.5)
    # the outlier batch would explode the params; with the skip the
    # result of the epoch must stay finite and close to a 1-sample epoch
    trained = out["params"]
    ref = train_solver_sci(deq, params, [samples[0]], n_epochs=1,
                           base_lr=1e-3, print_every_n_steps=100)["params"]
    for a, b in zip(jax.tree.leaves(trained), jax.tree.leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_ema_tracks_and_competes_for_best(rng):
    """With ema_decay on: evals run for BOTH raw and EMA weights, the EMA
    is a convex trail of the raw iterates (distinct from raw after one
    step), and when the EMA scores higher the saved best snapshot carries
    the EMA weights."""
    deq, params, samples = _tiny_problem(rng, n=2)
    saved = {}

    def save_fn(tag, snapshot):
        saved[tag] = snapshot

    eval_calls = []

    def eval_fn(p):
        # score EMA evals (every 2nd call) higher than raw
        eval_calls.append(p)
        return float(len(eval_calls))

    out = train_solver_sci(deq, params, samples, n_epochs=1, base_lr=1e-2,
                           eval_fn=eval_fn, save_fn=save_fn,
                           ema_decay=0.5,
                           save_every_n_steps=100, print_every_n_steps=100)
    # epoch-end eval: raw then EMA -> 2 calls, EMA scored higher
    assert len(eval_calls) == 2
    assert "best" in saved
    ema_evaluated = eval_calls[1]
    best_leaves = jax.tree_util.tree_leaves(saved["best"]["params"])
    ema_leaves = jax.tree_util.tree_leaves(
        jax.tree.map(np.asarray, ema_evaluated))
    for b, e in zip(best_leaves, ema_leaves):
        np.testing.assert_allclose(b, e)
    # EMA must differ from the final raw weights (it lags the iterates)
    raw_leaves = jax.tree_util.tree_leaves(
        jax.tree.map(np.asarray, out["params"]))
    assert any(np.abs(b - r).max() > 0
               for b, r in zip(best_leaves, raw_leaves))


def test_mixed_horizon_training(rng):
    """Mixed-horizon mode (VERDICT r4 #5): passing a {max_iter: deq} dict
    samples one horizon per batch and still trains. Both horizons must be
    exercised (deterministic RNG, 8 steps over 2 horizons) and the loss
    must stay finite and decrease."""
    net = DnCNN(features=8, num_layers=3, use_bn=False)
    params = net.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)))
    step = make_gap_sci_step(lambda p, x: net.apply(p, x), tag="denoiser")
    traced = set()

    def counted(h):
        d = make_deq(step, m=5, lam=1e-2, max_iter=h, tol=1e-6)

        def f(params, z0, args):
            traced.add(h)  # records jit-trace time, once per horizon
            return d(params, z0, args)
        return f

    deqs = {h: counted(h) for h in (4, 8)}

    samples = []
    for _ in range(8):
        gt = rng.random((16, 16, 8)).astype(np.float32)
        Phi = (rng.random((16, 16, 8)) > 0.5).astype(np.float32)
        y = np.asarray(A(jnp.asarray(gt)[None], jnp.asarray(Phi)[None]))[0]
        samples.append({"gt": gt, "meas": y, "mask": Phi})

    out = train_solver_sci(deqs, params, samples, n_epochs=1, base_lr=1e-3,
                           print_every_n_steps=100)
    assert traced == {4, 8}, f"horizons exercised: {traced}"
    assert np.isfinite(float(jax.tree.reduce(
        lambda a, b: a + jnp.sum(jnp.abs(b)), out["params"], 0.0)))
