"""Pallas TPU kernels + the dispatch policy the model consults.

Kernels only run compiled on an accelerator backend; CPU (tests, fake
meshes) takes the numerically-identical plain-XLA twins. The
``set_force_interpret`` hook lets the CPU test suite exercise the
*integrated* kernel paths (const preparation + model wiring + the kernel
bodies under ``interpret=True``) that would otherwise only ever execute
on hardware — see tests/test_fused_integration.py.
"""

from __future__ import annotations

_FORCE_INTERPRET = False


def set_force_interpret(enabled: bool) -> None:
    """Test hook: route model fast-path dispatch to interpret-mode kernels
    even on the CPU backend. Never enable in production code."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = bool(enabled)


def force_interpret() -> bool:
    return _FORCE_INTERPRET


def accel_ok() -> bool:
    """Should Pallas fast paths dispatch? True on real accelerator
    backends, or under the test-only interpret override."""
    import jax

    return _FORCE_INTERPRET or jax.default_backend() != "cpu"
