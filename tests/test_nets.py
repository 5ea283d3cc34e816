"""Network zoo: shapes, variants, FFDNet mosaic parity with the reference
indexing scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqsci_tpu.nets.ffdnet import FFDNet, depth_to_space, space_to_depth
from deqsci_tpu.nets.resnet import NBlockResNet
from deqsci_tpu.nets.unet import UNet
from deqsci_tpu.zoo import build_denoiser


def _reference_space_to_depth(x_nchw):
    """Numpy restatement of the reference's interleaved downsampling
    (networks/ffdnet/functions.py:48-50): channel 4*c + idx."""
    n, c, h, w = x_nchw.shape
    out = np.zeros((n, 4 * c, h // 2, w // 2), x_nchw.dtype)
    for i, (r, s) in enumerate([(0, 0), (0, 1), (1, 0), (1, 1)]):
        out[:, i::4] = x_nchw[:, :, r::2, s::2]
    return out


@pytest.mark.parametrize("c", [1, 3])
def test_space_to_depth_matches_reference(rng, c):
    x = rng.standard_normal((2, 8, 8, c)).astype(np.float32)
    got = np.asarray(space_to_depth(jnp.asarray(x)))          # NHWC
    want = _reference_space_to_depth(
        x.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(got, want)


def test_depth_to_space_inverts(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_ffdnet_shapes(rng):
    net = FFDNet(in_channels=1)
    x = jnp.zeros((4, 32, 32, 1))
    v = net.init(jax.random.key(0), x, jnp.zeros((4,)))
    out = net.apply(v, x, jnp.full((4,), 0.1))
    assert out.shape == (4, 32, 32, 1)


@pytest.mark.parametrize(
    "conv3d", [pytest.param(False, marks=pytest.mark.slow),
               pytest.param(True, marks=pytest.mark.slow)])
def test_unet_shapes(conv3d):
    net = UNet(out_chans=1, chans=8, num_pool_layers=3, conv3d=conv3d)
    shape = (1, 8, 32, 32, 1) if conv3d else (2, 32, 32, 1)
    x = jnp.zeros(shape)
    v = net.init(jax.random.key(0), x)
    out = net.apply(v, x)
    assert out.shape == shape


@pytest.mark.slow
def test_unet_odd_size_reflect_pad():
    """48x42 inputs exercise the odd-size reflect-pad fix at every level."""
    net = UNet(out_chans=1, chans=4, num_pool_layers=4)
    x = jnp.zeros((1, 49, 42, 1))
    v = net.init(jax.random.key(0), x)
    out = net.apply(v, x)
    assert out.shape == (1, 49, 42, 1)


def test_unet_clamp_variant():
    net = UNet(out_chans=1, chans=4, num_pool_layers=2, final_clamp=True)
    x = jnp.full((1, 16, 16, 1), 100.0)
    v = net.init(jax.random.key(0), x)
    out = net.apply(v, x)
    assert float(jnp.max(out)) <= 1.0 and float(jnp.min(out)) >= -1.0


def test_resnet_mean_restore(rng):
    net = NBlockResNet(out_chans=1, features=8, n_residual_blocks=1)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    v = net.init(jax.random.key(0), x)
    out = net.apply(v, x)
    assert out.shape == x.shape


_SLOW_ZOO = {"unet", "unet3d"}  # full-size U-Net compiles dominate runtime
ALL_ZOO = ["unet", "unet3d", "unet_norm", "resnet", "dncnn_norm", "ffdnet",
           "unet3d_noise", "unetnorm_noise", "resnet_noise", "DnCNN",
           "SimpleCNN", "RealSN_DnCNN", "RealSN_SimpleCNN"]


@pytest.mark.parametrize(
    "name", [pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_ZOO
             else n for n in ALL_ZOO])
def test_zoo_builds_and_applies(name):
    spec = build_denoiser(name)
    v = spec.init_variables(h=32, w=32, t=8)
    apply_fn = spec.apply_fn()
    x = jnp.zeros((1, 8, 32, 32, 1)) if spec.conv3d else jnp.zeros((8, 32, 32, 1))
    if spec.needs_sigma:
        out = apply_fn(v, x, jnp.full((x.shape[0],), 0.1))
    else:
        out = apply_fn(v, x)
    assert out.shape == x.shape


def test_zoo_unknown_raises():
    with pytest.raises(NotImplementedError):
        build_denoiser("nope")


def test_packed_split2_matches_highest(rng):
    """The packed-split2 scheme must agree with full-precision conv up to
    the static bf16 weight rounding (~1e-3 relative) on one application."""
    import jax.numpy as jnp

    from deqsci_tpu.nets.dncnn import DnCNN

    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    exact = DnCNN(num_layers=4, use_bn=False, precision="highest")
    packed = DnCNN(num_layers=4, use_bn=False, precision="packed")
    variables = exact.init(jax.random.key(0), x)
    a = np.asarray(exact.apply(variables, x))
    b = np.asarray(packed.apply(variables, x))   # same param tree
    scale = np.abs(a).max() + 1e-8
    assert np.abs(a - b).max() / scale < 5e-3


def test_packed_split2_is_differentiable(rng):
    import jax
    import jax.numpy as jnp

    from deqsci_tpu.nets.dncnn import DnCNN

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    net = DnCNN(num_layers=4, use_bn=False, precision="packed")
    variables = net.init(jax.random.key(0), x)

    def loss(v):
        return jnp.mean(net.apply(v, x) ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_bn_fold_matches_inference_bn(rng):
    """fold_batchnorm: the bn_fold module on folded params must reproduce
    the inference-mode BN module exactly (pure affine algebra) in
    'highest' precision, and closely in the packed scheme (the folded
    kernel is scaled in f32 BEFORE its single bf16 rounding)."""
    import jax
    from deqsci_tpu.nets.dncnn import fold_batchnorm
    from deqsci_tpu.nets.ffdnet import FFDNet

    x = jnp.asarray(rng.random((2, 32, 32, 1)).astype(np.float32))
    sigma = jnp.asarray([0.1, 0.02], jnp.float32)

    net = FFDNet(in_channels=1, precision="highest")
    variables = net.init(jax.random.key(3), x, sigma)
    # non-trivial running stats / affine params
    variables = jax.tree.map(lambda a: a, variables)
    stats = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.abs(np.random.default_rng(1).random(a.shape)) + 0.1,
            a.dtype), variables["batch_stats"])
    params = variables["params"]
    variables = {"params": params, "batch_stats": stats}

    ref = net.apply(variables, x, sigma)
    folded = fold_batchnorm(variables)
    assert "batch_stats" not in folded
    assert all(not k.startswith("bn") for k in folded["params"])
    out = FFDNet(in_channels=1, precision="highest",
                 bn_fold=True).apply(folded, x, sigma)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)

    ref_p = FFDNet(in_channels=1, precision="packed").apply(
        variables, x, sigma)
    out_p = FFDNet(in_channels=1, precision="packed",
                   bn_fold=True).apply(folded, x, sigma)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                               rtol=2e-2, atol=2e-3)


def test_bn_fold_dncnn17(rng):
    """fold_batchnorm generalizes to the 17-layer BN DnCNN family."""
    import jax
    from deqsci_tpu.nets.dncnn import DnCNN, fold_batchnorm

    x = jnp.asarray(rng.random((1, 24, 24, 1)).astype(np.float32))
    net = DnCNN(channels=1, num_layers=6, use_bn=True, precision="highest")
    variables = net.init(jax.random.key(0), x)
    stats = jax.tree.map(
        lambda a: a + jnp.asarray(
            np.abs(np.random.default_rng(2).random(a.shape)) + 0.05,
            a.dtype), variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}
    ref = net.apply(variables, x)
    out = DnCNN(channels=1, num_layers=6, use_bn=True, precision="highest",
                bn_fold=True).apply(fold_batchnorm(variables), x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
