"""Golden parity vs the torch-CPU oracle on real reference data/weights.

Full-protocol (100-iteration) parity is measured by
``scripts/run_parity.py`` on TPU and recorded in PARITY.md; these tests
keep the fast wiring-level guarantees in CI: checkpoint conversion,
single-step equivalence, and short-solve equivalence on the bundled
drop8 benchmark.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not present")

CNN_CKPT = os.path.join(REFERENCE_ROOT, "models/cnn.ckpt")
RSN_CKPT = os.path.join(REFERENCE_ROOT, "models/rsn_cnn.ckpt")
DROP8 = os.path.join(REFERENCE_ROOT, "data/test_gray/drop8_cacti.mat")


@pytest.fixture(scope="module")
def drop8():
    from deqsci_tpu.data.sci_mat import load_test_data
    return load_test_data(DROP8)


@pytest.fixture(scope="module")
def torch_cnn():
    from tests.oracle.torch_pipeline import SimpleCNNOracle
    return SimpleCNNOracle().load_reference(CNN_CKPT).eval()


@pytest.fixture(scope="module")
def flax_cnn():
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.nets.dncnn import DnCNN
    variables, _ = convert_dncnn(CNN_CKPT)
    # exact precision: these are bitwise-level oracle comparisons
    net = DnCNN(num_layers=4, use_bn=False, precision="highest")
    return net, variables


def test_dncnn_conversion_parity(rng, torch_cnn, flax_cnn):
    """Converted flax DnCNN == torch oracle on random input."""
    import torch
    net, variables = flax_cnn
    x = rng.standard_normal((3, 64, 64, 1)).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = torch_cnn(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_rsn_cnn_conversion_parity(rng):
    """rsn_cnn.ckpt: stored normalized SN weights load as plain convs."""
    import torch
    from tests.oracle.torch_pipeline import SimpleCNNOracle
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.nets.dncnn import DnCNN

    variables, sn = convert_dncnn(RSN_CKPT)
    assert set(sn) == {"conv0", "conv1", "conv2", "conv3"}
    # exact precision: these are bitwise-level oracle comparisons
    net = DnCNN(num_layers=4, use_bn=False, precision="highest")
    oracle = SimpleCNNOracle().load_reference(RSN_CKPT).eval()
    x = rng.standard_normal((2, 32, 32, 1)).astype(np.float32)
    got = np.asarray(net.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_gap_step_parity_on_drop8(drop8, torch_cnn, flax_cnn):
    """One full GAP+denoise step on real data matches the oracle."""
    import torch
    from tests.oracle.torch_pipeline import GapSCIOracle
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.ops.sensing import phi_sum

    net, variables = flax_cnn
    mask = drop8["mask"]
    y = drop8["meas"][..., 0] if drop8["meas"].ndim == 3 else drop8["meas"]
    z0 = y[..., None] * mask

    # torch oracle
    tm = torch.from_numpy(mask)[None]
    ty = torch.from_numpy(y)[None]
    tps = torch.sum(tm, dim=3)
    tps[tps == 0] = 1
    oracle_step = GapSCIOracle(torch_cnn, "denoiser")
    with torch.no_grad():
        want = oracle_step(torch.from_numpy(z0)[None], ty, tm, tps)[0].numpy()

    # jax
    denoise = lambda p, x: net.apply(p, x)
    step = make_gap_sci_step(denoise, tag="denoiser")
    Phi = jnp.asarray(mask)[None]
    got = np.asarray(step(variables, jnp.asarray(z0)[None], jnp.int32(0),
                          (jnp.asarray(y)[None], Phi, phi_sum(Phi))))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_short_deq_parity_on_drop8(drop8, torch_cnn, flax_cnn):
    """8-iteration Anderson DEQ inference matches the oracle end to end."""
    import torch
    from tests.oracle.torch_pipeline import GapSCIOracle, deq_infer_oracle
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor

    net, variables = flax_cnn
    mask = drop8["mask"]
    y = drop8["meas"][..., 0] if drop8["meas"].ndim == 3 else drop8["meas"]

    tm = torch.from_numpy(mask)[None]
    ty = torch.from_numpy(y)[None]
    tps = torch.sum(tm, dim=3)
    tps[tps == 0] = 1
    x0 = ty.unsqueeze(3) * tm
    oracle_step = GapSCIOracle(torch_cnn, "denoiser")
    want, res_o, k_o = deq_infer_oracle(oracle_step, ty, tm, tps, x0,
                                        max_iter=8)

    denoise = lambda p, x: net.apply(p, x)
    step = make_gap_sci_step(denoise, tag="denoiser")
    recon = make_reconstructor(step, m=5, lam=1e-2, max_iter=8, tol=1e-5,
                               beta=1.0)
    got = np.asarray(recon(variables, jnp.asarray(y)[None],
                           jnp.asarray(mask)))[0]
    np.testing.assert_allclose(got, want[0].numpy(), rtol=1e-3, atol=5e-4)
