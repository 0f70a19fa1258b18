"""world_modelz_tpu — a TPU-native JAX framework for video world models.

A ground-up re-design of the capabilities of world-modelz/world-modelz
(masked discrete diffusion over VQ token grids, sparse space-time diffusion,
SOM-latent continuous DDPM) for TPU hardware:

- functional core: all reference state mutation (VQ-EMA codebooks, SOM adapt,
  model EMA, loss-aware time sampling) is explicit state-in/state-out, so every
  update is jit-able and shards transparently under pjit global-view SPMD.
- models are flax.linen modules in NHWC / (B,S,H,W,D) layouts (TPU-native).
- parallelism is jax.sharding over a Mesh (data/model axes), not a port of any
  single-device loop; XLA inserts the collectives.
- hot ops (VQ nearest-codebook search, local 3D windowed space-time attention)
  have Pallas TPU kernels with XLA reference implementations and golden tests.

Subpackages
-----------
ops        pure functional math: vector quantization, SOM, attention primitives
models     flax.linen model definitions (autoencoders, transformers, UNet)
diffusion  masked discrete diffusion + continuous DDPM processes and samplers
data       host-side input pipelines (MovingMNIST, trajectory buffers, images)
train      train states, optimizers, EMA, schedules, checkpointing
parallel   mesh construction and sharding rules
kernels    Pallas TPU kernels
serve      batched continuous rollout service (request coalescing, one
           compiled program)
cli        command-line entry points mirroring the reference scripts
"""

__version__ = "0.1.0"
