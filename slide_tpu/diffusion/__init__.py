"""Diffusion engines.

  eps.py    — epsilon-prediction DDPM (the reference's `pointnet2/util.py`
              engine): linear beta schedule, MSE training loss, ancestral
              sampling compiled to ONE `lax.scan` over timesteps.
  x0.py     — x0-parameterized engine (`diffusion_utils/diffusion.py`):
              beta schedule zoo, chamfer-based training losses, posterior
              sampling with clamping and local-resampling masks; plus the
              latent-diffusion wrapper.
  fastdpm.py — FastDPM accelerated VAR/STEP samplers (`util_fastdpmv2.py`).
"""

from slide_tpu.diffusion.eps import (
    DiffusionSchedule,
    calc_diffusion_hyperparams,
    diffusion_training_loss,
    diffusion_sampling,
)
from slide_tpu.diffusion.fastdpm import (
    fast_sampling,
    fast_x0_denoise,
    diffusion_config_of,
    get_var_noise,
    get_step_steps,
)
from slide_tpu.diffusion.x0 import (
    get_beta_schedule,
    X0Schedule,
    x0_training_loss,
    x0_denoise,
    denoising_step,
    diffuse,
    diffuse_t_steps,
)

__all__ = [
    "DiffusionSchedule", "calc_diffusion_hyperparams",
    "diffusion_training_loss", "diffusion_sampling",
    "fast_sampling", "fast_x0_denoise", "diffusion_config_of",
    "get_var_noise", "get_step_steps",
    "get_beta_schedule", "X0Schedule", "x0_training_loss", "x0_denoise",
    "denoising_step", "diffuse", "diffuse_t_steps",
]
