from slide_tpu.configs.presets import (
    keypoint_ddpm_config,
    autoencoder_config,
    latent_ddpm_config,
    upsampler_config,
    SHAPENET_CATEGORIES,
)

__all__ = ["keypoint_ddpm_config", "autoencoder_config", "latent_ddpm_config", "upsampler_config",
           "SHAPENET_CATEGORIES"]
