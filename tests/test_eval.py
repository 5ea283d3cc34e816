"""Evaluation protocol: snapshot slicing, drop/runner rule, metric shape."""

import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.sensing import A
from deqsci_tpu.train.eval import evaluate_file, snapshots_of
from deqsci_tpu.train.metrics import psnr, psnr_np, ssim


def _perfect_recon(params, meas, mask):
    """A 'reconstructor' that returns the gt stored in params per snapshot."""
    gt = params  # (S, H, W, T)
    return gt[: meas.shape[0]]


def _make_file(rng, s, name, h=16, w=16, t=8):
    gt = rng.random((h, w, s * t)).astype(np.float32)
    mask = (rng.random((h, w, t)) > 0.5).astype(np.float32)
    frames = np.moveaxis(gt.reshape(h, w, s, t), 2, 0)
    meas = np.stack([np.asarray(A(jnp.asarray(frames[i])[None],
                                  jnp.asarray(mask)[None]))[0]
                     for i in range(s)], -1)
    return {"gt": gt, "mask": mask, "meas": meas, "file": name}, frames


def test_snapshots_of():
    assert snapshots_of(np.zeros((4, 4))).shape == (1, 4, 4)
    assert snapshots_of(np.zeros((4, 4, 6))).shape == (6, 4, 4)


def test_evaluate_file_perfect_recon(rng):
    data, frames = _make_file(rng, s=3, name="traffic_like.mat")
    r = evaluate_file(lambda p, m, k: jnp.asarray(frames), None, data,
                      compute_ssim=True)
    assert len(r["psnr_per_snapshot"]) == 3
    assert r["psnr"] > 80  # exact reconstruction
    assert r["ssim"] > 0.99


def test_drop_runner_first_snapshot_only(rng):
    data, frames = _make_file(rng, s=4, name="drop8_cacti.mat")
    calls = {}

    def recon(p, meas, mask):
        calls["n_snapshots"] = meas.shape[0]
        return jnp.asarray(frames[: meas.shape[0]])

    r = evaluate_file(recon, None, data, compute_ssim=False)
    assert calls["n_snapshots"] == 1
    assert len(r["psnr_per_snapshot"]) == 1


def test_psnr_conventions(rng):
    a = rng.random((8, 8)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((8, 8)).astype(np.float32),
                0, 1)
    jp = float(psnr(jnp.asarray(a), jnp.asarray(b)))
    np_ = psnr_np(a, b)
    np.testing.assert_allclose(jp, np_, rtol=1e-4)


def test_ssim_identity_is_one(rng):
    a = rng.random((32, 32, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(a), jnp.asarray(a))) > 0.999
