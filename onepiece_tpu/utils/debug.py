"""Numeric-discipline debug switches (SURVEY §5 sanitizer analogue).

The reference has no sanitizers; its closest analogue is DEBUG_MODE prints
(ref: src/Geometry/Geometry.h:18). The JAX-native equivalents are
NaN/Inf trapping inside jitted programs and deterministic-key PRNG
discipline (already the default throughout — every stochastic op takes an
explicit key). Enable trapping for a debugging session with:

    from onepiece_tpu.utils import debug
    debug.enable_numeric_checks()

Any jitted program producing a NaN/Inf then raises at the producing op
instead of silently corrupting downstream state.
"""

from __future__ import annotations

import jax


def enable_numeric_checks(nans: bool = True, infs: bool = True) -> None:
    """Turn on jax debug_nans/debug_infs (recompiles jitted fns on demand)."""
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)


def disable_numeric_checks() -> None:
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
