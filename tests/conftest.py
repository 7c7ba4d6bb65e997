"""Test configuration: run everything on a virtual 8-device CPU backend so
the data-parallel/collective paths are exercised without TPU hardware
(SURVEY.md §4: multi-host tests via JAX's multi-process CPU backend).

jax may already be imported by the interpreter's sitecustomize before this
conftest runs, so the platform is forced via jax.config (which takes effect
at lazy backend initialization) rather than environment variables.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
