"""One backend predicate for every Pallas-vs-reference dispatch site.

The round-4 review found three hand-rolled platform checks that could
disagree on the ``axon``-tunneled chip (``ops/fast_pallas.py``,
``ops/batch_patch.py`` said ``platform == "tpu"``; ``core/spd.py`` said
``platform != "cpu"``): worst case the fused FAST front-end silently fell
back to the ~50-pass reference formulation while the Pallas Cholesky ran.
This module is now the single source of truth.

Semantics: the TPU path is taken whenever the effective default platform
is anything other than ``cpu`` — on this image the only non-CPU platform
is the (possibly tunneled) TPU, and the axon plugin reports its devices
with ``platform == "tpu"`` while the *backend name* may differ, so a
not-cpu test is the robust form.  ``jax.default_device`` is honored so
host-side scene construction under ``with jax.default_device(cpu)`` in a
TPU-backed process picks the reference paths (Pallas compiled mode is
TPU-only).  ``MCPTAM_NO_PALLAS=1`` force-disables every kernel at once.
"""

from __future__ import annotations

import os

import jax

__all__ = ["is_tpu_backend", "use_pallas", "kernel_report"]


def is_tpu_backend() -> bool:
    """True when jitted code will land on the TPU (axon included)."""
    dd = jax.config.jax_default_device
    if dd is not None:
        return dd.platform != "cpu"
    return jax.default_backend() != "cpu"


def use_pallas() -> bool:
    """True when the Pallas kernel tier should engage."""
    if os.environ.get("MCPTAM_NO_PALLAS"):
        return False
    return is_tpu_backend()


def kernel_report() -> dict:
    """Which kernel tier each dispatch site would take right now.

    Logged by the bench (``extra.kernels``) so a hardware run records
    which paths actually engaged — a silent reference-path fallback on
    the chip is a perf bug, not a preference.
    """
    up = use_pallas()
    return {
        "backend": jax.default_backend(),
        "is_tpu": is_tpu_backend(),
        "pallas_fast": up,
        "pallas_gather": up,
        "pallas_spd": up,
        "pallas_esm": up,
        "spd_kernel": os.environ.get("MCPTAM_SPD_KERNEL", "blocked"),
    }
