"""Global Pallas-tier switch (the ``--no_pallas`` escape hatch).

The lax path is the always-available reference tier (SURVEY.md §8 M5:
"keep the lax path as a --no_pallas fallback forever"); kernels activate
only on the TPU backend (or under interpreter mode in tests).
"""

from __future__ import annotations

import jax

_ENABLED = True

# Per-kernel gates, set from v5e measurements (see kernel docstrings):
#   * instance-norm fusion wins ISOLATED (0.62ms vs 0.84ms fwd at the
#     resblock bottleneck) but LOSES composed into the full jitted train
#     step (56.0 vs 60.1 img/s at bf16+VGG bs8) — the custom call is a
#     fusion barrier for XLA and its saved residuals add HBM traffic.
#   * the scalar loss reductions lose to XLA's native reduction pipeline
#     (3.4ms vs 1.4ms on a 134MB operand).
# Both default OFF and stay implemented + golden-tested as the tuning
# surface for later rounds (conv+IN fusion INSIDE one kernel is the next
# step that could actually beat XLA here).
_IN_KERNEL = False
_LOSS_KERNELS = False
# fused reflect-pad backward (ops/pallas/reflect_pad.py): replaces XLA's
# slice/rev/add-chain VJP with one read+write per sample. Measured ON THE
# TPU at the resblock shape ([32,32,16,1024] pad 1, bf16): pallas 1.03 ms
# (scratch fold) / 1.15 ms (direct fold) vs XLA's derived VJP 0.77 ms —
# Mosaic's static-index read-modify-writes on the sublane (W) axis cost
# more than the fold saves, and in-graph XLA additionally fuses the
# slice-adds into neighboring gradient work. OFF; kept golden-tested as a
# tuning surface (a transposed W-major fold is the next idea).
_PAD_BWD_KERNEL = False


def set_enabled(flag: bool) -> None:
    global _ENABLED
    _ENABLED = bool(flag)


def set_in_kernel(flag: bool) -> None:
    global _IN_KERNEL
    _IN_KERNEL = bool(flag)


def set_pad_bwd(flag: bool) -> None:
    global _PAD_BWD_KERNEL
    _PAD_BWD_KERNEL = bool(flag)


def pad_bwd_enabled() -> bool:
    if not _ENABLED or not _PAD_BWD_KERNEL:
        return False
    from . import reflect_pad

    if reflect_pad.INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def set_loss_kernels(flag: bool) -> None:
    global _LOSS_KERNELS
    _LOSS_KERNELS = bool(flag)


def enabled() -> bool:
    if not _ENABLED:
        return False
    from . import instance_norm

    if instance_norm.INTERPRET:
        return True
    return _IN_KERNEL and jax.default_backend() == "tpu"


def losses_enabled() -> bool:
    if not _ENABLED:
        return False
    from . import losses

    if losses.INTERPRET:
        return True
    return _LOSS_KERNELS and jax.default_backend() == "tpu"


# fused encode_input kernel (ops/pallas/encode.py): builds g_packed + cond
# (one-hot + edges + mask_box + reflect-pad + s2d2) in one VMEM pass per
# tile. No gradient flows through the build, so there is no VJP to lose
# to; gate measured end-to-end on the v5e (see kernel docstring).
# Modes (env HIMAN_ENCODE_KERNEL for A/B harness runs):
#   0 = off (jnp/XLA build)
#   1 = both outputs from Pallas (g_packed + cond)
#   2 = g_packed only — cond stays on XLA's fused build, preserving the
#       one-hot -> avgpool producer fusion of the D cond pyramid (the
#       fusion whose break made the strided-slices pool variant lose,
#       nnops.py _POOL_IMPL note)
#   3 = mode 1 + the scale-1 pooled cond ALSO from Pallas
#       (encode_cond_pooled), so materializing cond costs no pool re-read
#
# Default = 2: measured end-to-end on the v5e flagship step (512x256 bs32
# bf16, reports/encode_ab_r03.jsonl + confirmation run this session):
#   mode 0  92.56 img/s | mode 1  93.03 | mode 2  93.43 | mode 3  92.08
# — the g_packed expansion from Pallas beats XLA's select_n chain while
# leaving the D cond on XLA keeps its one-hot->avgpool producer fusion.
# This is the first Pallas kernel in the tier that WINS composed into the
# full train step (SURVEY §8 M5 / BASELINE.json:5 native tier).
import os as _os

# Empty string falls back to the same default as unset (advisor r3: the
# earlier `or "0"` made HIMAN_ENCODE_KERNEL='' an accidental off switch).
_ENCODE_KERNEL = int(_os.environ.get("HIMAN_ENCODE_KERNEL", "2") or "2")


def set_encode_kernel(mode) -> None:
    global _ENCODE_KERNEL
    _ENCODE_KERNEL = int(mode)


def _encode_mode() -> int:
    if not _ENABLED:
        return 0
    from . import encode

    if encode.INTERPRET:
        # tests: INTERPRET activates the kernels; an explicitly set mode
        # still selects WHICH arms run (default = mode 1)
        return _ENCODE_KERNEL or 1
    if jax.default_backend() != "tpu":
        return 0
    return _ENCODE_KERNEL


def encode_enabled() -> bool:
    """True when the Pallas g_packed build is active (modes 1/2/3)."""
    return _encode_mode() >= 1


def encode_cond_enabled() -> bool:
    """True when cond ALSO comes from the Pallas kernel (modes 1/3)."""
    return _encode_mode() in (1, 3)


def encode_pool_enabled() -> bool:
    """True when the scale-1 pooled cond comes from Pallas too (mode 3)."""
    return _encode_mode() == 3
