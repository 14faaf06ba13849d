"""ESMStereo-TPU: a TPU-native stereo depth estimation framework.

A ground-up JAX/XLA/Pallas reimplementation of the capability surface of
ESMStereo (reference: /root/reference, arXiv:2506.21091): real-time stereo
disparity estimation with cost-volume matching, 3-D aggregation and
ShuffleMixer-based disparity upsampling.

Design notes (TPU-first, not a port):
  * NHWC / NDHWC layouts everywhere (TPU lane dimension = channels).
  * Pure-functional ops library (``ops``) with jnp reference implementations
    and Pallas TPU kernels for the hot paths (cost volumes).
  * Flax module zoo (``nn``, ``models``) with batch-stat collections.
  * SPMD scaling via ``jax.sharding`` mesh + sharding constraints
    (``parallel``): XLA inserts halo exchanges for spatially-sharded convs.
"""

__version__ = "0.1.0"
