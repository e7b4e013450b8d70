"""Test env: force CPU JAX with an 8-device virtual mesh (SURVEY §4.8).

The container's sitecustomize registers the real-TPU PJRT plugin and pins
JAX_PLATFORMS before any of our code runs, so env vars are too late; the
jax config API still works as long as no backend has initialized.  Set
VLUT_TEST_TPU=1 to run the suite on real hardware (single chip, no virtual
mesh).
"""

import os

import jax

if not os.environ.get("VLUT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
