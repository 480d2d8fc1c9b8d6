from .gan import gan_loss, discriminator_loss
from .feature_matching import feature_matching_loss
from .perceptual import vgg_loss
from .layout import layout_ce_loss, object_mask_loss

__all__ = [
    "gan_loss",
    "discriminator_loss",
    "feature_matching_loss",
    "vgg_loss",
    "layout_ce_loss",
    "object_mask_loss",
]
