"""difficp_tpu — TPU-native diffeomorphic point-set registration framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
``AdrienWohrer/diff-icp`` reference (diffeomorphic ICP registration for single
and multiple point sets, GSI 2023):

- Two-set registration (classic ICP): register a point set onto a GMM whose
  centroids are the second point set (``difficp_tpu.api.icp_two_set``).
- Groupwise atlas building: K frames x S structures registered to common GMM
  models inferred by EM (``difficp_tpu.api.icp_atlas``).
- Registrations are diffeomorphic (LDDMM geodesic shooting,
  ``difficp_tpu.models.lddmm``) or affine (closed form,
  ``difficp_tpu.models.affine``).
- The "standard" Glaunès/Deformetrica-style template algorithm
  (``difficp_tpu.models.psr_standard``, ``difficp_tpu.api.standard_*``).

Design (TPU-first, not a port):

- Static shapes everywhere: ragged point sets are padded with explicit masks
  (a masked point has weight 0 in every reduction and energy term).
- Pure-functional pytree state; every step is a jitted pure function.
- Pairwise Gaussian kernel reductions are streamed/tiled (Pallas) instead of
  materializing the (M, N) matrix (the KeOps role in the reference).
- Per-frame registrations run in lockstep via ``vmap`` (replacing the
  sequential ``for k in range(K)`` loop of the reference) and shard over a
  ``jax.sharding.Mesh`` 'frames' axis; GMM M-step sufficient statistics are
  psum-reduced across devices.
"""

__version__ = "0.1.0"

from difficp_tpu.utils.spec import default_dtype  # noqa: F401
