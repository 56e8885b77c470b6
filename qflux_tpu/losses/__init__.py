from qflux_tpu.losses.losses import (
    AttentionMaskMseLoss,
    MaskEditLoss,
    MseLoss,
    map_mask_to_latent,
)

__all__ = ["MseLoss", "MaskEditLoss", "AttentionMaskMseLoss", "map_mask_to_latent"]
