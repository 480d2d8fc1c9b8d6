from .nnops import (
    avg_pool_3x3s2,
    conv2d,
    conv_transpose2d,
    instance_norm,
    leaky_relu,
    max_pool_2x2,
    reflect_pad,
    relu,
    segment_mean_2d,
    upsample_nearest_2x,
)
from .onehot_edges import encode_input, instance_edges, one_hot_label
from .boxcomposite import (
    box_mask,
    crop_resize,
    expand_to_context_window,
    mask_box,
    paste_resize,
)

__all__ = [
    "avg_pool_3x3s2",
    "conv2d",
    "conv_transpose2d",
    "instance_norm",
    "leaky_relu",
    "max_pool_2x2",
    "reflect_pad",
    "relu",
    "segment_mean_2d",
    "upsample_nearest_2x",
    "encode_input",
    "instance_edges",
    "one_hot_label",
    "box_mask",
    "crop_resize",
    "expand_to_context_window",
    "mask_box",
    "paste_resize",
]
