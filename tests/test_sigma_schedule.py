"""FFDNet sigma-schedule parity: the reference's object state (reset on new
measurement, x0.971 per call) vs our call-index schedule, end to end
through a short Anderson DEQ solve — the SURVEY.md "hard part #2"."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from deqsci_tpu.io.torch_ckpt import convert_ffdnet
from deqsci_tpu.maps.gap_sci import make_gap_sci_step
from deqsci_tpu.nets.ffdnet import FFDNet
from deqsci_tpu.recon import make_reconstructor
from tests.oracle.torch_pipeline import (FFDNetOracle, GapSCIOracle,
                                         deq_infer_oracle)


def test_ffdnet_deq_matches_oracle(tmp_path, rng):
    # random-weight FFDNet shared by both pipelines
    oracle_net = FFDNetOracle().eval()
    sd = {f"nonlinear_op.intermediate_dncnn.itermediate_dncnn.{k}": v
          for k, v in oracle_net.body.state_dict().items()}
    path = tmp_path / "ffdnet_rand.ckpt"
    torch.save({"solver_state_dict": sd, "epoch": 0}, path)
    variables, _ = convert_ffdnet(str(path))
    net = FFDNet(in_channels=1)

    h = w = 32
    t = 8
    gt = rng.random((h, w, t)).astype(np.float32)
    Phi = (rng.random((h, w, t)) > 0.5).astype(np.float32)
    y = (gt * Phi).sum(-1).astype(np.float32)

    # oracle: stateful sigma schedule, 10-iteration Anderson
    tm = torch.from_numpy(Phi)[None]
    ty = torch.from_numpy(y)[None]
    tps = torch.sum(tm, dim=3)
    tps[tps == 0] = 1
    x0 = ty.unsqueeze(3) * tm
    step_o = GapSCIOracle(oracle_net, "ffdnet")
    want, _, _ = deq_infer_oracle(step_o, ty, tm, tps, x0, max_iter=10)

    # ours: sigma = sigma0 * 0.971**k via the call index
    step = make_gap_sci_step(lambda v, x, s: net.apply(v, x, s),
                             tag="ffdnet")
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0, max_iter=10,
                               tol=1e-5)
    got = np.asarray(recon(variables, jnp.asarray(y)[None],
                           jnp.asarray(Phi)))[0]
    np.testing.assert_allclose(got, want[0].numpy(), rtol=2e-3, atol=2e-4)
