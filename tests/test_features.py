"""Instance-feature clustering path: kmeans, encode, cluster, sample."""

import numpy as np

from neurips18_hierchical_image_manipulation_tpu.eval.features import (
    cluster_features,
    kmeans,
    sample_cluster_features,
)


def test_kmeans_separates_blobs(rng):
    a = rng.randn(50, 3) * 0.1
    b = rng.randn(50, 3) * 0.1 + 5.0
    centers = kmeans(np.concatenate([a, b]), 2, seed=0)
    d = np.abs(centers.mean(1) - np.array([0.0, 5.0])[None])
    # one center near each blob (order-free)
    assert sorted(np.round(centers.mean(1), 0).tolist()) == [0.0, 5.0]


def test_kmeans_fewer_samples_than_clusters(rng):
    x = rng.randn(2, 3).astype(np.float32)
    c = kmeans(x, 5)
    assert c.shape == (5, 3)


def test_cluster_and_sample(rng):
    feats = {26: [np.ones(3), np.ones(3) * 2], 24: [np.zeros(3)]}
    clusters = cluster_features(feats, label_nc=35, n_clusters=2, feat_num=3)
    assert clusters.shape == (35, 2, 3)
    inst = np.zeros((1, 8, 8), np.int32)
    inst[0, :4] = 26000
    inst[0, 4:] = 24001
    fmap = sample_cluster_features(clusters, inst, cluster_idx=0)
    assert fmap.shape == (1, 8, 8, 3)
    # regions painted with their class centers
    assert np.allclose(fmap[0, 0, 0], clusters[26, 0])
    assert np.allclose(fmap[0, 7, 0], clusters[24, 0])
