"""gigapose_tpu — TPU-native (JAX/XLA/Pallas) 6-DoF novel-object pose estimation.

A from-scratch rebuild of the capabilities of nv-nguyen/gigapose (reference at
/root/reference) designed TPU-first:

- ``lib3d``     : pure-JAX 2D-affine / projective / SE3 geometry (ref: src/lib3d/).
- ``ops``       : jit/vmap compute ops — crop, patch similarity + cycle consistency,
                  one-correspondence RANSAC, closed-form 6D recovery, Pallas kernels
                  (ref: src/models/matching.py, ransac.py, poses.py).
- ``models``    : flax ViT (DINOv2-style) AE network, ResNet+MLP IST network, losses
                  (ref: src/models/network/, src/models/loss.py).
- ``pipeline``  : the end-to-end jitted coarse-pose estimator + template onboarding
                  (ref: src/models/gigaPose.py).
- ``dataloader``: host-side BOP data plumbing, GT keypoint sampler, tar shard reader
                  (ref: src/dataloader/, src/custom_megapose/).
- ``refiner``   : render-and-compare refinement (ref: src/megapose/).
- ``parallel``  : jax.sharding mesh helpers for data-parallel train/eval.
- ``training``  : optax train state, losses, loop.

Everything device-side is fixed-shape + boolean-mask (XLA-friendly); the reference's
-1 / -1000 sentinel conventions are preserved only at the host I/O boundary.
"""

__version__ = "0.1.0"
