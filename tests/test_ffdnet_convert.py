"""FFDNet torch->flax conversion round trip (BN + mosaic ordering).

Builds the torch FFDNet oracle with random weights, saves a solver-style
state dict, converts, and checks output parity — this is the path the
reference's (stripped) ffdnet.ckpt would take.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from deqsci_tpu.io.torch_ckpt import convert_ffdnet
from deqsci_tpu.nets.ffdnet import FFDNet
from tests.oracle.torch_pipeline import FFDNetOracle


def test_ffdnet_roundtrip(tmp_path, rng):
    oracle = FFDNetOracle()
    # randomize BN stats so conversion of mean/var is actually exercised
    with torch.no_grad():
        for m in oracle.body:
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.1)
    oracle.eval()

    sd = {f"nonlinear_op.intermediate_dncnn.itermediate_dncnn.{k}": v
          for k, v in oracle.body.state_dict().items()}
    path = tmp_path / "ffdnet_like.ckpt"
    torch.save({"solver_state_dict": sd, "epoch": 0}, path)

    variables, _ = convert_ffdnet(str(path))
    # exact-precision net for the bitwise-level oracle comparison (the
    # production default 'packed' carries bf16 weight rounding ~1e-3)
    net = FFDNet(in_channels=1, precision="highest")

    x = rng.standard_normal((3, 32, 32, 1)).astype(np.float32)
    sigma = np.float32([0.1, 0.2, 0.3])
    got = np.asarray(net.apply(variables, jnp.asarray(x),
                               jnp.asarray(sigma)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                      torch.from_numpy(sigma)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
