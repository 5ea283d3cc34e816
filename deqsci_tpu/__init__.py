"""deqsci_tpu — a TPU-native (JAX/XLA/Pallas) deep-equilibrium imaging framework.

A from-scratch rebuild of the capability surface of DEQSCI
("Deep Equilibrium Models for Video Snapshot Compressive Imaging", AAAI'23),
designed TPU-first:

* operators and iteration maps are pure functions (``ops/``, ``maps/``),
* fixed-point solving is ``lax.while_loop`` with on-device residual checks
  (``fp/``),
* the implicit-function-theorem gradient is a ``jax.custom_vjp`` whose
  backward pass reuses the same root-finder on the transpose-Jacobian
  equation (``fp/deq.py``),
* batching/devices are ``vmap`` + sharded meshes (``dist/``),
* hot paths have Pallas TPU kernels (``ops/pallas/``).

Reference parity notes cite file:line into the upstream repository.
"""

__version__ = "0.1.0"
