"""Child process for the real multi-host test (tests/test_dist.py).

Each invocation is one "host": it initializes ``jax.distributed`` (Gloo
collectives on the CPU backend), loads ONLY its ``ProcessShardedDataset``
slice of a deterministic global batch, assembles the global sharded batch
with ``jax.make_array_from_process_local_data``, runs one sharded DEQ
train step over the global ``('data',)`` mesh, and writes the (replicated)
updated parameters + loss to an .npz for the parent to compare across
world sizes. The reference's whole parallelism story is single-process
``nn.DataParallel`` (video_sci_proxgrad.py:128,196-198); this exercises
the TPU-native multi-host equivalent end to end: per-process data
loading + cross-process gradient psum inserted by GSPMD.

Usage: python multihost_child.py <pid> <nprocs> <port> <out.npz>

Env knobs (defaults preserve the original 2-process x 2-device test):
``MULTIHOST_CHILD_DEVCOUNT`` — virtual CPU devices per process;
``MULTIHOST_CHILD_GBATCH`` — global batch size (must be divisible by
the world's total device count). ``__graft_entry__.dryrun_multichip``
reuses this child for its nested 2-process x (n/2)-device certificate.
"""

import os
import sys

_DEVCOUNT = int(os.environ.get("MULTIHOST_CHILD_DEVCOUNT", "2"))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={_DEVCOUNT}")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nprocs, process_id=pid)
    assert jax.process_index() == pid and jax.process_count() == nprocs

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from deqsci_tpu.dist.mesh import ProcessShardedDataset
    from deqsci_tpu.fp.deq import make_deq
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.train.loop import make_optimizer, make_train_step

    # Deterministic global dataset: every process constructs the same
    # arrays but *loads* only its shard (as real per-host loaders would).
    h = w = 16
    t = 8
    gbatch = int(os.environ.get("MULTIHOST_CHILD_GBATCH", "4"))
    rng = np.random.default_rng(7)
    samples = []
    for _ in range(gbatch):
        gt = rng.random((h, w, t)).astype(np.float32)
        Phi = (rng.random((h, w, t)) > 0.5).astype(np.float32)
        samples.append({"gt": gt, "mask": Phi,
                        "meas": np.sum(gt * Phi, -1).astype(np.float32)})
    local = list(ProcessShardedDataset(samples))
    assert len(local) == gbatch // nprocs
    lgt = np.stack([s["gt"] for s in local])
    lphi = np.stack([s["mask"] for s in local])
    ly = np.stack([s["meas"] for s in local])

    net = DnCNN(features=8, num_layers=3, use_bn=False, precision="high")
    variables = net.init(jax.random.key(0), jnp.zeros((1, h, w, 1)))
    step = make_gap_sci_step(lambda p, x: net.apply(p, x), tag="denoiser")
    deq = make_deq(step, m=5, lam=1e-2, max_iter=6, tol=1e-7)
    optimizer = make_optimizer(1e-3)
    opt_state = optimizer.init(variables)
    train_step = make_train_step(deq, optimizer)

    mesh = Mesh(np.asarray(jax.devices()), ("data",))
    batch_s = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    with mesh:
        gt_g = jax.make_array_from_process_local_data(
            batch_s, lgt, (gbatch, h, w, t))
        phi_g = jax.make_array_from_process_local_data(
            batch_s, lphi, (gbatch, h, w, t))
        y_g = jax.make_array_from_process_local_data(
            batch_s, ly, (gbatch, h, w))
        params = jax.device_put(variables, rep)
        opt_state = jax.device_put(opt_state, rep)
        params, _, loss, _ = train_step(params, opt_state, gt_g, y_g, phi_g)

    flat = {"/".join(map(str, path)): np.asarray(leaf) for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}
    if pid == 0:
        np.savez(out, loss=float(loss), **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
