import os
import subprocess
import sys

import pytest

# In the TPU dev environment a sitecustomize hook registers the 'axon' TPU
# backend at interpreter startup and overrides JAX_PLATFORMS. Unit tests on
# that backend are pathologically slow (every eager op is remote-compiled),
# so when we detect it we re-exec pytest once with a clean environment: an
# 8-device virtual CPU mesh, which also exercises the pjit sharding paths
# (SURVEY.md section 4e).
if os.environ.get("PALLAS_AXON_POOL_IPS") and not os.environ.get("_EMRT_TESTS_REEXEC"):
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["_EMRT_TESTS_REEXEC"] = "1"
    # pytest's fd-capture has already redirected fd1/fd2 to temp files, but
    # it keeps dup'ed saves of the original pipes at higher fd numbers —
    # point fd1/fd2 back at those so the re-exec'd run stays visible.
    # The saved originals are the lowest fds > 2 that are NOT pytest's
    # unlinked capture temp files ("(deleted)") and not sockets.
    import fcntl
    restored = []
    for fd in range(3, 32):
        try:
            target = os.readlink(f"/proc/self/fd/{fd}")
            mode = fcntl.fcntl(fd, fcntl.F_GETFL) & os.O_ACCMODE
        except OSError:
            continue
        if target.endswith("(deleted)") or target.startswith("socket:"):
            continue
        if mode not in (os.O_WRONLY, os.O_RDWR):
            continue
        restored.append(fd)
    if len(restored) >= 2:
        os.dup2(restored[0], 1)
        os.dup2(restored[1], 2)
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"


CPU_MESH_ENV = {
    **{k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"},
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def run_on_cpu_mesh(code: str, timeout: int = 900) -> str:
    """Run a python snippet in a subprocess with an 8-device CPU mesh."""
    result = subprocess.run([sys.executable, "-c", code], env=CPU_MESH_ENV,
                            capture_output=True, text=True, timeout=timeout)
    assert result.returncode == 0, result.stderr[-3000:]
    return result.stdout


@pytest.fixture
def cpu_mesh():
    return run_on_cpu_mesh
