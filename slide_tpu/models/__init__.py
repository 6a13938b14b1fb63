"""Model zoo: the conditional PointNet++ denoiser (position/feature DDPM and
SAP refinement backbone), point autoencoder stack, and alternative backbones.
"""

from slide_tpu.models.denoiser import ConditionalPointNet2

__all__ = ["ConditionalPointNet2"]
