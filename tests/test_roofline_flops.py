"""True-MAC conv FLOP counting in tools/roofline_step.py (VERDICT r3
weak#1: the naive dilated-volume count put gradient convs above the
chip's physical peak and inflated the step ledger ~30%)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from roofline_step import _conv_flops  # noqa: E402


def _rec(**kw):
    base = dict(
        lhs_shape=[4, 16, 32, 8],
        rhs_shape=[3, 3, 8, 16],
        dimension_numbers=[[0, 3, 1, 2], [3, 2, 0, 1], [0, 3, 1, 2]],
        lhs_dilation=[1, 1],
        rhs_dilation=[1, 1],
        window_strides=[1, 1],
        padding=[[1, 1], [1, 1]],
        feature_group_count=1,
    )
    base.update(kw)
    return base


def _brute_macs(rec):
    """Independent brute force: walk every (output position, kernel tap)
    pair and count taps that land on a REAL (non-lhs-dilation-zero)
    sample. Padding taps count as work, same as the naive convention."""
    lhs, rhs = rec["lhs_shape"], rec["rhs_shape"]
    dn = rec["dimension_numbers"]
    lspatial, rspatial = dn[0][2:], dn[1][2:]
    n, cin, cout = lhs[dn[0][0]], lhs[dn[0][1]], rhs[dn[1][0]]
    total = 1
    for i, d in enumerate(lspatial):
        ld, rd = rec["lhs_dilation"][i], rec["rhs_dilation"][i]
        k = rhs[rspatial[i]]
        size = (lhs[d] - 1) * ld + 1
        ksize = (k - 1) * rd + 1
        pad = rec["padding"][i]
        stride = rec["window_strides"][i]
        o = (size + pad[0] + pad[1] - ksize) // stride + 1
        taps = 0
        for y in range(o):
            s = y * stride - pad[0]
            for j in range(k):
                if (s + j * rd) % ld == 0:
                    taps += 1
        total *= taps
    return 2.0 * n * cout * cin * total / rec["feature_group_count"]


def test_plain_conv_matches_naive():
    rec = _rec()
    naive = 2.0 * 4 * 16 * 32 * 16 * 8 * 9
    assert _conv_flops(rec) == naive


def test_strided_conv():
    rec = _rec(window_strides=[2, 2])
    assert _conv_flops(rec) == _brute_macs(rec)


def test_lhs_dilated_dgrad_counts_true_macs():
    """The stride-2 dgrad (lhs_dilation=2) spec from the flagship step:
    true MACs ~ naive/4, never above it, exactly the brute-force count."""
    rec = _rec(lhs_dilation=[2, 2], padding=[[2, 2], [2, 2]])
    got = _conv_flops(rec)
    assert got == _brute_macs(rec)
    naive_dim = lambda lhs_d, k: ((lhs_d - 1) * 2 + 1 + 4 - 3 + 1) * k  # noqa: E731
    naive = 2.0 * 4 * 16 * naive_dim(16, 3) * naive_dim(32, 3) / 9 * 8 * 9
    assert got < 0.3 * naive


def test_rhs_dilated_wgrad_is_naive():
    """rhs dilation (wgrad) spreads real weights over real samples —
    every tap is arithmetic, count unchanged."""
    rec = _rec(rhs_dilation=[2, 2], padding=[[2, 2], [2, 2]])
    assert _conv_flops(rec) == _brute_macs(rec)


def test_transposed_conv_flops_equal_forward():
    """dgrad of a stride-2 conv does the same arithmetic as its forward:
    fwd out(8x16) x k9 x cin8 x cout16 == dgrad true MACs."""
    fwd = _rec(
        lhs_shape=[4, 16, 32, 8],
        rhs_shape=[3, 3, 8, 16],
        window_strides=[2, 2],
        padding=[[1, 1], [1, 1]],
    )
    # matching dgrad: lhs = fwd output grad [4, 8, 16, 16], transposed
    # kernel 16->8, lhs_dilation = fwd stride, padding = k-1-p
    dgrad = _rec(
        lhs_shape=[4, 8, 16, 16],
        rhs_shape=[3, 3, 16, 8],
        lhs_dilation=[2, 2],
        padding=[[1, 2], [1, 2]],
    )
    assert abs(_conv_flops(fwd) - _conv_flops(dgrad)) / _conv_flops(fwd) < 0.07
