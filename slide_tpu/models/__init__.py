"""Model zoo: the conditional PointNet++ denoiser (position/feature DDPM and
SAP refinement backbone), point autoencoder stack, and alternative backbones.
"""

from slide_tpu.models.denoiser import ConditionalPointNet2
from slide_tpu.models.encoder import PointNetEncoder
from slide_tpu.models.upsample_decoder import (point_upsample,
                                               PointUpsampleDecoder,
                                               KeypointDecoder)
from slide_tpu.models.autoencoder import PointAutoencoder
from slide_tpu.models.pointwise_net import PointwiseNet, get_pointwise_net
from slide_tpu.models.pvcnn import PVCNN2

__all__ = ["ConditionalPointNet2", "PointNetEncoder", "point_upsample",
           "PointUpsampleDecoder", "KeypointDecoder", "PointAutoencoder",
           "PointwiseNet", "get_pointwise_net", "PVCNN2"]
