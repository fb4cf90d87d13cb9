"""Command-line entry points (generate / pretrain / extract / probe / moco).

``FACL_PLATFORM=cpu`` (or any JAX platform name) pins the backend before
it initializes — useful for CPU smoke runs and for hosts where a
sitecustomize force-sets ``jax_platforms`` at interpreter start, which
makes the plain ``JAX_PLATFORMS`` env var ineffective (the config update
below still wins because no backend exists yet when the CLI package
imports)."""
import os

if os.environ.get("FACL_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["FACL_PLATFORM"])
