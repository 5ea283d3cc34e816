"""Device mesh + sharding rules for SCI workloads.

The reference's entire parallelism story is single-process
``nn.DataParallel`` (video_sci_proxgrad.py:128,196-198). The TPU-native
replacement is a 2-D logical mesh:

* ``data``  — batch / snapshot axis (pure data parallel; gradient psum
  rides ICI, inserted by XLA under jit);
* ``frame`` — the 8-frame temporal axis. The per-frame 2-D denoisers are
  frame-independent, and the GAP step's only cross-frame coupling is the
  mask-weighted sum ``A(z, Phi)`` — sharding frames turns that reduction
  into one small psum per iteration, the SCI analogue of sequence/context
  parallelism (SURVEY.md §5).

Parameters are replicated (the denoisers are tiny: <2 MB); activations are
sharded ``(data, ..., frame)``. Multi-host: the same mesh spans hosts —
data-parallel gradient reductions ride DCN, frame-parallel stays intra-host
on ICI if the mesh is laid out with ``frame`` innermost (the default here:
``create_device_mesh`` keeps the trailing axis on the closest devices).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_frame: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Create a ``(data, frame)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_frame
    assert n_data * n_frame <= len(devices), (
        f"need {n_data * n_frame} devices, have {len(devices)}")
    mesh_devs = mesh_utils.create_device_mesh(
        (n_data, n_frame), devices=devices[: n_data * n_frame])
    return Mesh(mesh_devs, ("data", "frame"))


def video_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, H, W, T) videos: batch over data, frames over frame."""
    return NamedSharding(mesh, P("data", None, None, "frame"))


def measurement_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, H, W) measurements: batch over data."""
    return NamedSharding(mesh, P("data", None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a (gt, y, Phi) batch with the standard shardings."""
    gt, y, Phi = batch
    return (jax.device_put(gt, video_sharding(mesh)),
            jax.device_put(y, measurement_sharding(mesh)),
            jax.device_put(Phi, video_sharding(mesh)))


def process_shard(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> range:
    """Index range of the dataset slice this host should load.

    Multi-host data parallelism: each process feeds its local devices its
    contiguous shard; the global batch is assembled by the data-axis
    sharding (gradient reductions ride DCN between hosts, ICI within).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = n // pc
    start = pi * per
    end = n if pi == pc - 1 else start + per
    return range(start, end)


class ProcessShardedDataset:
    """Per-host shard of an indexable dataset, optionally shuffled.

    The multi-host data-loading path: each process iterates only its
    ``process_shard`` slice and feeds its local devices; the global batch
    is assembled by the data-axis sharding. With one process (the
    single-host default) this is the identity wrapper, so the training CLI
    applies it unconditionally.

    ``shuffle_seed`` restores the reference's ``DataLoader(shuffle=True)``
    semantics (video_sci_proxgrad.py:135): every ``__iter__`` (= epoch)
    draws a fresh permutation of the GLOBAL index set from
    ``seed + epoch_counter``, then takes this process's contiguous slice
    of the permuted order — every host permutes identically (same seed),
    so the global epoch is a true permutation with no sample duplicated
    or dropped across hosts. ``__getitem__`` is intentionally unshuffled
    (stable random access for eval/debug)."""

    def __init__(self, dataset, process_index: Optional[int] = None,
                 process_count: Optional[int] = None,
                 shuffle_seed: Optional[int] = None):
        self.dataset = dataset
        self.indices = process_shard(len(dataset), process_index,
                                     process_count)
        self.shuffle_seed = shuffle_seed
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]

    def __iter__(self):
        if self.shuffle_seed is None:
            for i in self.indices:
                yield self.dataset[i]
            return
        import numpy as np
        perm = np.random.default_rng(
            self.shuffle_seed + self._epoch).permutation(len(self.dataset))
        self._epoch += 1
        for i in perm[self.indices.start:self.indices.stop]:
            yield self.dataset[int(i)]
