"""Net2Wider widening (nets/widen.py): function preservation + plumbing.

The widened checkpoint must compute the same function as its source
(PARITY.md round-4: the wider body is a throughput lever, not a
behavioral change at init), and the zoo must rebuild modules at the
width a loaded checkpoint carries.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqsci_tpu.nets.dncnn import DnCNN
from deqsci_tpu.nets.ffdnet import FFDNet
from deqsci_tpu.nets.widen import widen_hidden
from deqsci_tpu.zoo import build_denoiser, infer_denoiser_feats


def _randomize(variables, seed=0):
    """Replace init params/stats with non-degenerate random values (fresh
    BN stats are mean=0/var=1, which would hide BN-duplication bugs)."""
    rng = np.random.default_rng(seed)
    def noise(x):
        x = np.asarray(x)
        return jnp.asarray(rng.normal(0.0, 0.2, x.shape).astype(x.dtype))
    out = jax.tree.map(noise, variables)
    if "batch_stats" in out:
        out["batch_stats"] = jax.tree.map(
            lambda x: jnp.abs(x) + 0.5, out["batch_stats"])
    return out


def test_widen_dncnn_exact():
    mod = DnCNN(channels=1, features=8, num_layers=4, use_bn=True,
                precision="highest")
    x = jnp.asarray(np.random.default_rng(1).random((2, 16, 16, 1)),
                    jnp.float32)
    variables = _randomize(mod.init(jax.random.key(0), x))
    wide = widen_hidden(variables, 12, seed=3)
    y0 = mod.apply(variables, x)
    y1 = DnCNN(channels=1, features=12, num_layers=4, use_bn=True,
               precision="highest").apply(wide, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=1e-5)
    # asymmetric outgoing split: the duplicated pairs must NOT be
    # identical columns (dead-twin gradient symmetry)
    k1 = np.asarray(wide["params"]["conv1"]["kernel"])
    assert k1.shape[2] == 12 and k1.shape[3] == 12


def test_widen_ffdnet_exact_and_infer():
    spec = build_denoiser("ffdnet", precision="highest")
    x = jnp.asarray(np.random.default_rng(2).random((1, 16, 16, 1)),
                    jnp.float32)
    sig = jnp.asarray([0.1], jnp.float32)
    variables = _randomize(spec.module.init(jax.random.key(0), x, sig))
    assert infer_denoiser_feats(variables) == 64
    wide = widen_hidden(variables, 96, seed=0)
    assert infer_denoiser_feats(wide) == 96
    y0 = spec.module.apply(variables, x, sig)
    y1 = build_denoiser("ffdnet", precision="highest",
                        feats=96).module.apply(wide, x, sig)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=0, atol=2e-5)


def test_widen_rejects_narrowing():
    mod = DnCNN(channels=1, features=8, num_layers=3, use_bn=False)
    variables = mod.init(jax.random.key(0), jnp.zeros((1, 8, 8, 1)))
    with pytest.raises(ValueError):
        widen_hidden(variables, 8)


def test_cli_width_autoinference(tmp_path, rng, capsys):
    """A widened native checkpoint drives the CLI end to end: the module
    is rebuilt at the checkpoint's width without any flag."""
    import orbax.checkpoint as ocp
    import scipy.io as sio

    from deqsci_tpu.cli.video_sci import main

    gt = rng.random((32, 32, 8))
    mask = (rng.random((32, 32, 8)) > 0.5).astype(np.float64)
    sio.savemat(tmp_path / "tiny_cacti.mat",
                {"orig": gt * 255, "meas": np.sum(gt * mask, -1) * 255,
                 "mask": mask})
    spec = build_denoiser("ffdnet")
    variables = spec.module.init(jax.random.key(0),
                                 jnp.zeros((1, 16, 16, 1)),
                                 jnp.zeros((1,)))
    wide = widen_hidden(jax.tree.map(np.asarray, variables), 96)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(tmp_path / "ckpt"), {"params": wide, "epoch": 0},
               force=True)
    ckptr.wait_until_finished()
    out = main(["--denoiser", "ffdnet", "--and_maxiters", "3",
                "--loadpath", str(tmp_path / "ckpt"),
                "--testpath", str(tmp_path) + "/",
                "--savepath", str(tmp_path / "out") + "/",
                "--inference", "True"])
    assert np.isfinite(out["avg_psnr"])
    assert "rebuilding" in capsys.readouterr().out


def test_ffdnet_feats_field_shapes():
    mod = FFDNet(in_channels=1, feats=96, precision="highest")
    v = mod.init(jax.random.key(0), jnp.zeros((1, 16, 16, 1)),
                 jnp.zeros((1,)))
    assert v["params"]["conv0"]["kernel"].shape == (3, 3, 5, 96)
    assert v["params"]["conv14"]["kernel"].shape == (3, 3, 96, 4)
