"""Test harness: force an 8-device virtual CPU platform BEFORE jax initializes.

The reference never had a way to exercise its distributed path without real GPUs
(SURVEY.md §4); here every multi-chip test runs on a virtual CPU mesh. The axon
sitecustomize pre-registers a TPU backend and overrides ``jax_platforms``, so we
must both set the env var and update the config after import (backends are still
uninitialized at conftest time, so this is safe).
"""

import os

# T2S_TEST_TPU=1 leaves the real backend in place for the hardware-only
# gates (tests/test_int8_drift_gate.py); default is the 8-device virtual CPU
_USE_TPU = os.environ.get("T2S_TEST_TPU", "0") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")
# NOTE: no persistent compile cache here — with the axon remote-compile relay
# the cached CPU AOT artifacts can target a different machine config (observed
# "+prefer-no-scatter not supported on host" warnings, potential SIGILL).

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The CLIP BPE merge table is an external artifact (like model checkpoints);
# tests use the copy in the read-only reference mount when present.
_REF_BPE = (
    "/root/reference/Diffsound/sound_synthesis/modeling/modules/clip/"
    "bpe_simple_vocab_16e6.txt.gz"
)
if "T2S_CLIP_BPE" not in os.environ and os.path.exists(_REF_BPE):
    os.environ["T2S_CLIP_BPE"] = _REF_BPE


@pytest.fixture
def rng():
    return np.random.default_rng(0)
