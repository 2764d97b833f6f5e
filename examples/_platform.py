"""Shared example preamble: single-instance examples are latency-bound, so
they run on the host CPU unless TOYSPICE_PLATFORM selects an accelerator
(tpu) or 'auto' (JAX's default device)."""

import os


def select():
    plat = os.environ.get("TOYSPICE_PLATFORM", "cpu")
    if plat != "auto":
        import jax

        jax.config.update("jax_platforms", plat)
