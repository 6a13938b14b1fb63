"""slide_tpu — a TPU-native (JAX/XLA/Pallas/pjit) sparse-latent-point-diffusion
mesh generation framework with the capabilities of SLIDE
("Controllable Mesh Generation Through Sparse Latent Point Diffusion Models").

Layer map (mirrors the reference's capabilities, re-designed TPU-first):
  ops/        point-cloud primitives (FPS, kNN, ball query, grouping,
              interpolation, chamfer/EMD metrics) — pure-jnp reference
              implementations + Pallas kernels behind one API
  nn/         flax building blocks (shared MLPs with t/condition injection,
              set-abstraction, feature propagation, attention pooling)
  models/     denoiser networks, point autoencoder, upsample decoders
  diffusion/  epsilon- and x0-parameterized DDPM engines, latent diffusion,
              FastDPM accelerated samplers — sampling compiles to one lax.scan
  sap/        Shape-As-Points refinement: point upsampling, DPSR spectral
              Poisson solve, marching cubes mesh extraction (host callback)
  data/       ShapeNet-PSR datasets, npz datasets, dummy datasets, keypoint
              sampling, augmentation, per-host sharding
  train/      task drivers (position DDPM / autoencoder / latent DDPM / SAP)
              sharing one pjit train-step factory; EMA; checkpointing
  eval/       generation + quantitative eval (CD/F1/EMD/1-NNA/COV/MMD/JSD)
  cli/        single `python -m slide_tpu.cli ...` entry point
"""

__version__ = "0.1.0"
