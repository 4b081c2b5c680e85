from arvae_tpu.ops.losses import (
    bce_logits_recon_loss,
    gaussian_recon_loss,
    reconstruction_loss,
    token_cross_entropy_loss,
    token_accuracy,
    pixel_accuracy,
    kld_loss,
    attribute_reg_loss,
    total_reg_loss,
)

__all__ = [
    "bce_logits_recon_loss",
    "gaussian_recon_loss",
    "reconstruction_loss",
    "token_cross_entropy_loss",
    "token_accuracy",
    "pixel_accuracy",
    "kld_loss",
    "attribute_reg_loss",
    "total_reg_loss",
]
