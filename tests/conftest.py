"""Test configuration: force an 8-device virtual CPU mesh.

Multi-device sharding is exercised on CPU via
``--xla_force_host_platform_device_count=8`` (the standard JAX trick; the
reference has no multi-device tests to mirror — it has no tests at all,
SURVEY.md §4).

The environment may pin a remote-TPU PJRT plugin through ``sitecustomize``
(activated by ``PALLAS_AXON_POOL_IPS`` before any conftest can run), which
ignores ``JAX_PLATFORMS=cpu`` and would serialize every unit-test compile
through the device tunnel.  When that marker is present, re-exec the whole
pytest process once with a sanitized environment so the suite runs hermetic
and parallel on local CPU.
"""

import os
import sys

def _release_captured_stdio():
    """Undo pytest's fd-level capture before the re-exec below.

    Pytest dup2's fd 1/2 onto private tempfiles BEFORE importing initial
    conftests (the saved originals are CLOEXEC and die across execve), so
    without this the re-exec'd pytest would write its entire report into
    the dead process's capture file and the run would appear silent.
    """
    try:
        import gc

        from _pytest.capture import CaptureManager

        for obj in gc.get_objects():
            if isinstance(obj, CaptureManager):
                obj.suspend_global_capture(in_=True)
                break
    except Exception:
        pass  # capture not active (older pytest orders) — fds are real


if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get(
    "_MODCR_TESTS_REEXEC"
):
    _release_captured_stdio()
    env = dict(os.environ)
    for key in list(env):
        if key.startswith(("PALLAS_AXON", "AXON_", "TPU_")):
            env.pop(key)
    env["_MODCR_TESTS_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.execve(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
# Persistent compile cache: the suite jits dozens of tiny programs; caching
# them across runs cuts repeat wall time substantially.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("MODCR_TEST_CACHE", "/tmp/modcr_test_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
