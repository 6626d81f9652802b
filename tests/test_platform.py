"""``JAX_PLATFORMS`` env semantics for CLI subprocesses.

This image's sitecustomize registers the tunneled TPU plugin at
interpreter start and overrides ``jax_platforms`` to ``"axon,cpu"`` via
``jax.config.update`` — silently defeating the env var. Every CLI calls
``honor_env_platform()`` so ``JAX_PLATFORMS=cpu python evaluate.py ...``
really runs on CPU (one-TPU-process-at-a-time tunnel; see
``utils/platform.py``). This test runs in a fresh interpreter because
the pytest process itself already forced CPU in conftest.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

_PROBE = """
import jax
before = jax.config.jax_platforms
from videoframeinterpolation_tpu.utils.platform import honor_env_platform
honor_env_platform()
after = jax.config.jax_platforms
assert after == "cpu", (before, after)
assert all(d.platform == "cpu" for d in jax.devices()), jax.devices()
print("ok", before, "->", after)
"""


def test_honor_env_platform_forces_cpu_in_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-c", _PROBE], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


def test_honor_env_platform_noop_when_unset():
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    probe = """
import jax
before = jax.config.jax_platforms
from videoframeinterpolation_tpu.utils.platform import honor_env_platform
honor_env_platform()
assert jax.config.jax_platforms == before
print("ok")
"""
    r = subprocess.run(
        [sys.executable, "-c", probe], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
