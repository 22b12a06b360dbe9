"""Test harness.

Two jobs:

1. Environment scrubbing: the session environment registers a tunneled-TPU
   PJRT plugin in every interpreter via sitecustomize (PALLAS_AXON_POOL_IPS),
   and JAX backend init then blocks on the tunnel even under
   JAX_PLATFORMS=cpu. Unit tests must run on a local CPU mesh, so
   ``pytest_configure`` relaunches pytest once in a scrubbed environment
   (capture suspended so output flows normally).

2. Virtual 8-device CPU mesh BEFORE jax import, so channel/time sharding and
   halo exchange are testable without a TPU pod (SURVEY.md §4 item 4).
"""

import os
import subprocess
import sys

_REEXEC_MARK = "_CUBICSDR_TPU_TEST_REEXEC"

if not (os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get(_REEXEC_MARK) != "1"):
    # Safe to configure jax in-process.
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    if not (os.environ.get("PALLAS_AXON_POOL_IPS")
            and os.environ.get(_REEXEC_MARK) != "1"):
        return
    capman = config.pluginmanager.get_plugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env[_REEXEC_MARK] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""
    args = [sys.executable, "-m", "pytest",
            *config.invocation_params.args]
    rc = subprocess.call(args, env=env)
    os._exit(rc)


import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)


def make_tone(n, freq, fs, amp=1.0, phase=0.0):
    t = np.arange(n) / fs
    return (amp * np.exp(2j * np.pi * freq * t + 1j * phase)).astype(
        np.complex64)


@pytest.fixture
def tone():
    return make_tone
