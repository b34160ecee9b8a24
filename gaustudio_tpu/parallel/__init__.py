"""Multi-chip parallelism: device meshes, camera-DP, Gaussian-axis sharding.

The reference is strictly single-GPU (SURVEY.md §2.3: no torch.distributed /
NCCL anywhere); this package defines the TPU-native scaling story instead:

  * ``dp`` mesh axis — data parallel over cameras/views: each device renders
    a different view against the (gathered) Gaussian set; losses/grads and
    TSDF contributions reduce with ``psum``/``pmean`` over ICI.
  * ``gs`` mesh axis — the Gaussian-state analogue of tensor parallelism:
    the N-Gaussians axis of all parameters and optimizer moments is sharded;
    each step ``all_gather``s the set for rendering and autodiff transposes
    that gather into a ``reduce_scatter`` of the gradients.
"""

from gaustudio_tpu.parallel.mesh import make_mesh  # noqa: F401
