"""Tests for FID / mIoU evaluators."""

import numpy as np

import jax.numpy as jnp

from neurips18_hierchical_image_manipulation_tpu.eval.metrics import (
    FIDEvaluator,
    RunningStats,
    fid_from_stats,
    layout_miou,
    pixel_accuracy,
    segmentation_consistency,
)


def test_miou_perfect_and_disjoint():
    a = np.array([[0, 1], [2, 2]])
    assert layout_miou(a, a, 4) == 1.0
    b = np.array([[3, 3], [3, 3]])
    assert layout_miou(a, b, 4) == 0.0


def test_miou_partial():
    gt = np.zeros((4, 4), int)
    pred = np.zeros((4, 4), int)
    pred[:2] = 1  # half wrong as class 1
    # class0: inter 8, union 16 -> 0.5; class1: inter 0, union 8 -> 0
    np.testing.assert_allclose(layout_miou(pred, gt, 2), 0.25)


def test_pixel_accuracy_masked():
    gt = np.zeros((2, 2), int)
    pred = np.array([[0, 1], [1, 0]])
    mask = np.array([[1, 1], [0, 0]], np.float32)
    assert pixel_accuracy(pred, gt) == 0.5
    assert segmentation_consistency(pred, gt, mask[..., None][None]) == 0.5


def test_fid_zero_for_identical_stats(rng):
    mu = rng.randn(8)
    a = rng.randn(8, 8)
    sigma = a @ a.T
    assert abs(fid_from_stats(mu, sigma, mu, sigma)) < 1e-4  # eps-regularized


def test_fid_mean_shift():
    d = 4
    mu1, mu2 = np.zeros(d), np.ones(d) * 2.0
    sigma = np.eye(d)
    np.testing.assert_allclose(fid_from_stats(mu1, sigma, mu2, sigma), 16.0, atol=1e-4)


def test_running_stats_matches_numpy(rng):
    x = rng.randn(100, 5)
    rs = RunningStats(5)
    rs.update(x[:30]); rs.update(x[30:])
    mu, cov = rs.finalize()
    np.testing.assert_allclose(mu, x.mean(0), atol=1e-12)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False), atol=1e-10)


def test_fid_evaluator_separates_distributions(rng):
    def feat(images):
        return jnp.mean(images, axis=(1, 2))  # (B,3)

    ev = FIDEvaluator(feat, 3)
    real = rng.rand(32, 8, 8, 3).astype(np.float32) * 0.1
    fake_same = rng.rand(32, 8, 8, 3).astype(np.float32) * 0.1
    fake_far = rng.rand(32, 8, 8, 3).astype(np.float32) * 0.1 + 0.8
    ev.update(real_images=real, fake_images=fake_same)
    close = ev.compute()
    ev2 = FIDEvaluator(feat, 3)
    ev2.update(real_images=real, fake_images=fake_far)
    far = ev2.compute()
    assert far > close * 10
