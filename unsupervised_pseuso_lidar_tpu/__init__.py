"""unsupervised_pseuso_lidar_tpu — a TPU-native framework for unsupervised
monocular depth + ego-pose training and pseudo-LiDAR generation.

Brand-new JAX/XLA/Pallas/pjit design with the capabilities of
Monash-Connected-Autonomous-Vehicle/unsupervised-pseuso-LiDAR (the reference
is CUDA/PyTorch; this is not a port — see SURVEY.md for the capability map).

Layout conventions (TPU-first):
  * Images and feature maps are NHWC (batch, height, width, channels) —
    the layout XLA:TPU tiles onto the MXU/VPU without transposes.
  * All device code is shape-static and jittable; data-dependent filtering
    (e.g. the pseudo-LiDAR height crop) returns fixed-shape (points, mask).
  * Multi-chip scaling is expressed with jax.sharding.Mesh + NamedSharding,
    never with explicit collectives in user code.
"""

__version__ = "0.1.0"
