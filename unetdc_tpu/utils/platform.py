"""Explicit backend-platform override for CLI entry points.

`UNETDC_TPU_PLATFORM=cpu|tpu|axon|...` pins the JAX platform for a CLI
process. This exists because an environment may force a platform on every
interpreter at startup (this image's sitecustomize rewrites
``JAX_PLATFORMS`` to the TPU relay before user code runs), which makes the
plain env var useless for subprocesses — e.g. the GUIs' CLI runs
(gui/command.py) or CI drivers that need the CPU backend. Applying the
override through ``jax.config`` after importing jax wins over the env
variable as long as no backend has been initialized yet, so every CLI
``main()`` calls :func:`apply_platform_override` first."""

from __future__ import annotations

import os

ENV_VAR = "UNETDC_TPU_PLATFORM"


def apply_platform_override() -> None:
    plat = os.environ.get(ENV_VAR)
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
