"""Parity evaluators (SURVEY.md §6.5 / BASELINE.md): FID and layout mIoU.

* ``layout_miou``: mean intersection-over-union between predicted and GT
  semantic layouts — the structure-generator parity metric.
* ``segmentation_consistency``: pixel accuracy inside the edited box (the
  paper evaluates manipulation quality via segmentation consistency
  [P §4]).
* ``fid_from_features`` / ``FIDEvaluator``: Frechet distance between
  Gaussian fits of feature activations. True FID uses InceptionV3-pool3
  features; this environment has no pretrained Inception weights
  (zero egress), so the evaluator takes ANY feature extractor
  (``feature_fn``) — inject converted Inception/VGG weights through the
  npz seam (tools/load_vgg_weights.py) for paper-comparable numbers; the
  statistic machinery (mean/cov accumulation, matrix sqrt) is exact.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def layout_miou(pred_ids, gt_ids, num_classes: int, ignore_empty=True):
    """pred/gt: (B,H,W) int arrays. Returns mIoU over classes present in
    either map (reference-style eval over the label set)."""
    pred = np.asarray(pred_ids).reshape(-1)
    gt = np.asarray(gt_ids).reshape(-1)
    ious = []
    for c in range(num_classes):
        p = pred == c
        g = gt == c
        union = np.logical_or(p, g).sum()
        if union == 0:
            if not ignore_empty:
                ious.append(1.0)
            continue
        inter = np.logical_and(p, g).sum()
        ious.append(inter / union)
    return float(np.mean(ious)) if ious else 0.0


def pixel_accuracy(pred_ids, gt_ids, mask=None):
    pred = np.asarray(pred_ids)
    gt = np.asarray(gt_ids)
    correct = (pred == gt).astype(np.float64)
    if mask is not None:
        m = np.asarray(mask).astype(np.float64)
        return float((correct * m).sum() / max(m.sum(), 1.0))
    return float(correct.mean())


def segmentation_consistency(pred_ids, gt_ids, boxmask):
    """Pixel accuracy restricted to the edited box region [P §4]."""
    return pixel_accuracy(pred_ids, gt_ids, np.asarray(boxmask)[..., 0]
                          if np.asarray(boxmask).ndim == 4 else boxmask)


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    """Matrix square root of a PSD matrix via eigendecomposition."""
    w, v = np.linalg.eigh(a)
    w = np.clip(w, 0.0, None)
    return (v * np.sqrt(w)) @ v.T


def fid_from_stats(mu1, sigma1, mu2, sigma2, eps=1e-6):
    diff = mu1 - mu2
    # trace(sqrt(s1 s2)) via sqrt(s1) s2 sqrt(s1) (symmetric PSD form)
    s1_sqrt = _sqrtm_psd(sigma1 + eps * np.eye(len(mu1)))
    inner = s1_sqrt @ (sigma2 + eps * np.eye(len(mu2))) @ s1_sqrt
    covmean_trace = np.sqrt(np.clip(np.linalg.eigvalsh(inner), 0.0, None)).sum()
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * covmean_trace)


class RunningStats:
    """Streaming mean/covariance accumulator for feature batches."""

    def __init__(self, dim: int):
        self.n = 0
        self.sum = np.zeros(dim, np.float64)
        self.outer = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(0)
        self.outer += f.T @ f

    def finalize(self):
        assert self.n > 1, "need >1 samples for covariance"
        mu = self.sum / self.n
        cov = (self.outer - self.n * np.outer(mu, mu)) / (self.n - 1)
        return mu, cov


class FIDEvaluator:
    """FID over an injected feature extractor.

    feature_fn: (B,H,W,3) [-1,1] -> (B,D) pooled features (jittable).
    """

    def __init__(self, feature_fn: Callable, dim: int):
        self.feature_fn = jax.jit(feature_fn)
        self.real = RunningStats(dim)
        self.fake = RunningStats(dim)

    def update(self, real_images=None, fake_images=None):
        if real_images is not None:
            self.real.update(np.asarray(self.feature_fn(jnp.asarray(real_images))))
        if fake_images is not None:
            self.fake.update(np.asarray(self.feature_fn(jnp.asarray(fake_images))))

    def compute(self) -> float:
        mu_r, s_r = self.real.finalize()
        mu_f, s_f = self.fake.finalize()
        return fid_from_stats(mu_r, s_r, mu_f, s_f)


def vgg_pool_features(vgg_module, vgg_params):
    """Default feature_fn: mean-pooled relu5_1 VGG19 activations (paper-
    comparable only with injected pretrained weights)."""

    def fn(images):
        taps = vgg_module.apply(vgg_params, images)
        return jnp.mean(taps[-1], axis=(1, 2))

    return fn
