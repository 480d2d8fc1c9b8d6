from .imaging import Colorize, mkdirs, save_image, tensor2im, tensor2label
from .image_pool import ImagePool

__all__ = [
    "Colorize",
    "mkdirs",
    "save_image",
    "tensor2im",
    "tensor2label",
    "ImagePool",
]
