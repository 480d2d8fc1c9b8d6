"""Bbox crop / resize / paste-back compositing as jit-fusable ops.

The reference does these with PIL / torch indexing on the host using
dynamic crop sizes (SURVEY.md §4.4 "compositing hot path", BASELINE.json:5).
Under XLA everything must be static-shape, so the design diverges
deliberately (documented in SURVEY.md §8 "Hard parts / Dynamic box shapes"):

  * ``crop_resize``: gather-based sampling — a dynamic box (y0, x0, h, w)
    is cropped AND resized to a static (out_h, out_w) window in one
    vectorized gather. Nearest mode for label/instance maps, bilinear
    (align_corners=False, torch/PIL convention) for RGB.
  * ``paste_resize``: inverse-mapped composite — for every pixel of the
    full-resolution canvas we decide "inside the box?" and, if so, sample
    the (static-shape) patch at the corresponding relative coordinate.
    Output shape == canvas shape, so XLA sees only static shapes while the
    box itself stays a traced value. This is the TPU-idiomatic replacement
    for dynamic-size resize + slice-assign.
  * ``box_mask`` / ``mask_box``: coordinate-mask helpers for building the
    masked layout / masked RGB conditioning tensors.

Boxes are (y0, x0, h, w) in pixels, float32 or int32, traced values.
All functions are batched over the leading axis via vmap-compatible
per-image cores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _sample_coords(start, size, out_size):
    """Sample centers for resizing a ``size``-long interval to ``out_size``
    (align_corners=False): src = start + (i + 0.5) * size / out_size - 0.5."""
    i = jnp.arange(out_size, dtype=jnp.float32)
    return start + (i + 0.5) * (size / out_size) - 0.5


def _pil_cubic(t):
    """PIL's bicubic kernel (Keys, a = -0.5), support 2."""
    at = jnp.abs(t)
    return jnp.where(
        at < 1.0,
        ((1.5 * at - 2.5) * at) * at + 1.0,
        jnp.where(at < 2.0, ((-0.5 * at + 2.5) * at - 4.0) * at + 2.0, 0.0),
    )


def _pil_resample_weights(start, size, out_size, full):
    """(out_size, full) separable resample matrix reproducing PIL's
    ImagingResample coefficient rule for a bicubic resize of the window
    [start, start+size) to out_size, expressed over the FULL axis length
    so crop+resize is one weighted contraction.

    PIL downscale widens the kernel by filterscale = size/out (the
    antialiasing a point-sampled kernel lacks — the source of the
    bilinear-vs-bicubic divergence the resident bbox loader used to
    carry), clips the window at the crop bounds, and normalizes each
    row over the clipped support. Weights are a closed-form elementwise
    function of the traced (start, size), so the whole resample is two
    static-shape MXU matmuls per image — the TPU-idiomatic form of PIL's
    host loop. fp32 weights vs PIL's 8-bit fixed-point coefficients:
    sub-quantization difference on uint8 data."""
    scale = size / out_size
    fscale = jnp.maximum(scale, 1.0)
    centers = start + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale
    j = jnp.arange(full, dtype=jnp.float32)[None, :]
    w = _pil_cubic((j + 0.5 - centers[:, None]) / fscale)
    w = jnp.where((j >= start) & (j < start + size), w, 0.0)
    # degenerate/out-of-range windows (size 0, or fully outside [0,full))
    # zero every tap; guard the normalize so they produce zeros — finite,
    # like the bilinear path's clamped gather — instead of NaN rows that
    # surface as an unattributable NaN loss steps later. The guard keys on
    # |denom| ~ 0, not denom > 0: a partially-clipped window can survive
    # with only negative-lobe cubic taps (sum slightly negative) and PIL
    # still normalizes that row rather than zeroing it.
    denom = jnp.sum(w, axis=1, keepdims=True)
    ok = jnp.abs(denom) > 1e-6
    return jnp.where(ok, w / jnp.where(ok, denom, 1.0), 0.0)


def _crop_resize_pil_one(img, box, out_hw):
    y0, x0, bh, bw = [box[k].astype(jnp.float32) for k in range(4)]
    wy = _pil_resample_weights(y0, bh, out_hw[0], img.shape[0])
    wx = _pil_resample_weights(x0, bw, out_hw[1], img.shape[1])
    f = img.astype(jnp.float32)
    y = jnp.einsum(
        "oy,yxc,px->opc", wy, f, wx, preferred_element_type=jnp.float32
    )
    if jnp.issubdtype(img.dtype, jnp.floating):
        return y.astype(img.dtype)
    if jnp.issubdtype(img.dtype, jnp.unsignedinteger):
        # PIL clamps cubic overshoot to the uint range; match (it also
        # ROUNDS the intermediate separable pass to uint8, which we
        # deliberately don't — the float pipeline is strictly more
        # accurate; see test_boxcomposite's upscale bound)
        return jnp.clip(y, 0.0, float(jnp.iinfo(img.dtype).max))
    return y


def _crop_resize_one(img, box, out_hw, method):
    if method == "pil_bicubic":
        return _crop_resize_pil_one(img, box, out_hw)
    h_img, w_img = img.shape[0], img.shape[1]
    y0, x0, bh, bw = [box[k].astype(jnp.float32) for k in range(4)]
    ys = _sample_coords(y0, bh, out_hw[0])
    xs = _sample_coords(x0, bw, out_hw[1])
    if method == "nearest":
        # PIL/torch nearest for integer scale keeps top-left sample; the
        # +0.5-center floor convention below matches jax.image 'nearest'.
        yi = jnp.clip(jnp.floor(ys + 0.5).astype(jnp.int32), 0, h_img - 1)
        xi = jnp.clip(jnp.floor(xs + 0.5).astype(jnp.int32), 0, w_img - 1)
        return img[yi][:, xi]
    # bilinear with edge clamp: clamp the sample coordinate FIRST so the
    # interpolation weight is consistent with the clipped indices.
    ys = jnp.clip(ys, 0.0, h_img - 1.0)
    xs = jnp.clip(xs, 0.0, w_img - 1.0)
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    wy = (ys - y0f)[:, None, None]
    wx = (xs - x0f)[None, :, None]
    yi0 = y0f.astype(jnp.int32)
    yi1 = jnp.minimum(yi0 + 1, h_img - 1)
    xi0 = x0f.astype(jnp.int32)
    xi1 = jnp.minimum(xi0 + 1, w_img - 1)
    f = img.astype(jnp.float32)
    top = f[yi0][:, xi0] * (1 - wx) + f[yi0][:, xi1] * wx
    bot = f[yi1][:, xi0] * (1 - wx) + f[yi1][:, xi1] * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32)


@functools.partial(jax.jit, static_argnames=("out_hw", "method"))
def crop_resize(images, boxes, out_hw, method="bilinear"):
    """Batched dynamic-box crop + resize to static (out_h, out_w).

    images: (B,H,W,C); boxes: (B,4) = (y0,x0,h,w). Returns (B,out_h,out_w,C).
    """
    return jax.vmap(lambda im, bx: _crop_resize_one(im, bx, out_hw, method))(
        images, boxes
    )


def _coord_grids(h, w):
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]
    return yy, xx


def _box_mask_one(h, w, box, dtype):
    y0, x0, bh, bw = [box[k].astype(jnp.float32) for k in range(4)]
    yy, xx = _coord_grids(h, w)
    inside = (yy >= y0) & (yy < y0 + bh) & (xx >= x0) & (xx < x0 + bw)
    return inside.astype(dtype)[..., None]


@functools.partial(jax.jit, static_argnames=("hw", "dtype"))
def box_mask(boxes, hw, dtype=jnp.float32):
    """(B,4) boxes -> (B,H,W,1) binary inside-box masks at static (H,W)."""
    return jax.vmap(lambda bx: _box_mask_one(hw[0], hw[1], bx, dtype))(boxes)


def mask_box(images, boxes, fill=0.0):
    """Fill the box interior of each image with ``fill`` — builds the
    masked-layout / masked-RGB conditioning inputs (SURVEY.md §4.2/§4.4)."""
    m = box_mask(boxes, images.shape[1:3], dtype=images.dtype)
    return images * (1.0 - m) + fill * m


def _paste_resize_one(canvas, patch, box, method):
    h, w = canvas.shape[0], canvas.shape[1]
    ph, pw = patch.shape[0], patch.shape[1]
    y0, x0, bh, bw = [box[k].astype(jnp.float32) for k in range(4)]
    yy, xx = _coord_grids(h, w)
    inside = (yy >= y0) & (yy < y0 + bh) & (xx >= x0) & (xx < x0 + bw)
    # inverse map: canvas pixel center -> patch coordinate
    py = (yy - y0 + 0.5) * (ph / jnp.maximum(bh, 1.0)) - 0.5
    px = (xx - x0 + 0.5) * (pw / jnp.maximum(bw, 1.0)) - 0.5
    if method == "nearest":
        pyi = jnp.clip(jnp.floor(py + 0.5).astype(jnp.int32), 0, ph - 1)
        pxi = jnp.clip(jnp.floor(px + 0.5).astype(jnp.int32), 0, pw - 1)
        sampled = patch[pyi, pxi]
    else:
        py = jnp.clip(py, 0.0, ph - 1.0)
        px = jnp.clip(px, 0.0, pw - 1.0)
        y0f = jnp.floor(py)
        x0f = jnp.floor(px)
        wy = (py - y0f)[..., None]
        wx = (px - x0f)[..., None]
        yi0 = y0f.astype(jnp.int32)
        yi1 = jnp.minimum(yi0 + 1, ph - 1)
        xi0 = x0f.astype(jnp.int32)
        xi1 = jnp.minimum(xi0 + 1, pw - 1)
        f = patch.astype(jnp.float32)
        sampled = (
            f[yi0, xi0] * (1 - wy) * (1 - wx)
            + f[yi0, xi1] * (1 - wy) * wx
            + f[yi1, xi0] * wy * (1 - wx)
            + f[yi1, xi1] * wy * wx
        ).astype(canvas.dtype)
    return jnp.where(inside[..., None], sampled, canvas)


@functools.partial(jax.jit, static_argnames=("method",))
def paste_resize(canvases, patches, boxes, method="bilinear"):
    """Resize each static-shape patch to its dynamic box and composite into
    the canvas — the paste-back step of the two-step pipeline (SURVEY §4.4
    steps 3 and 5). canvases: (B,H,W,C); patches: (B,ph,pw,C); boxes: (B,4).
    """
    return jax.vmap(lambda c, p, bx: _paste_resize_one(c, p, bx, method))(
        canvases, patches, boxes
    )


def context_window_math(y0, x0, bh, bw, hw, context_scale, out_size, xp):
    """THE context-window rule — single source of truth shared by the host
    bbox dataset (xp=numpy, training crops) and the jitted two-step
    pipeline (xp=jnp, inference), so train and inference windows come from
    the SAME distribution (VERDICT r1 weak#6). Square window =
    ``context_scale`` × the box's max side, floored at
    ``max(out_size/8, 8)``, centered, clipped to the image, integer-floored
    exactly like the host crop indices.
    """
    cy = y0 + bh / 2.0
    cx = x0 + bw / 2.0
    min_side = max(float(out_size) / 8.0, 8.0)
    side = xp.maximum(xp.maximum(bh, bw) * context_scale, min_side)
    side_h = xp.minimum(side, float(hw[0]))
    side_w = xp.minimum(side, float(hw[1]))
    wy0 = xp.floor(xp.clip(cy - side_h / 2.0, 0.0, hw[0] - side_h))
    wx0 = xp.floor(xp.clip(cx - side_w / 2.0, 0.0, hw[1] - side_w))
    return wy0, wx0, xp.floor(side_h), xp.floor(side_w)


def expand_to_context_window(boxes, hw, context_scale=2.0, out_size=128):
    """Expand object boxes to their training context windows, clipped to
    the image (SURVEY.md C8) — vectorized jnp form of
    ``context_window_math`` (same rule as the host dataset).

    boxes: (B,4) float (y0,x0,h,w) -> (B,4) float context windows.
    """
    wy0, wx0, side_h, side_w = context_window_math(
        boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3],
        hw, context_scale, out_size, jnp,
    )
    return jnp.stack([wy0, wx0, side_h, side_w], axis=1)
