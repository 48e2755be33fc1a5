import os
import sys

# XLA's CPU backend occasionally segfaults *inside compilation* (LLVM pass
# recursion) when the whole suite's compiles run on the default 8 MB main
# stack.  The main thread's stack VMA grows on page fault up to
# RLIMIT_STACK, so raising the soft limit at runtime is enough — no re-exec
# (which would also lose pytest's captured stdout fds).
try:
    import resource

    _want = 256 << 20
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    if _soft != resource.RLIM_INFINITY and _soft < _want:
        resource.setrlimit(resource.RLIMIT_STACK, (
            _want if _hard == resource.RLIM_INFINITY else min(_want, _hard),
            _hard))
except Exception:
    pass  # best-effort; the suite still runs on the default stack

# Run the test suite on an 8-device virtual CPU mesh.  This environment's
# terminal pins JAX_PLATFORMS=axon via config (env alone is overridden), so
# force the platform through jax.config before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
# Subprocess-based tests (CLI golden diffs, multihost workers) must not
# inherit the remote-TPU platform plugin: its sitecustomize pins the
# platform back to the tunnel, and when the tunnel is down the child
# blocks forever in backend init.  The suite is CPU-only by design.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if p and ".axon_site" not in p)
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # jax missing or backends already initialized
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _drop_jax_executables_between_modules():
    """Free compiled XLA executables after each test module.

    The suite compiles hundreds of distinct programs; XLA:CPU's JIT has
    crashed (segfault inside LLVM during a *later* compile) once enough
    executables accumulate in one process.  Dropping the jit caches
    between modules keeps the resident JIT state small; modules recompile
    what they share, which is cheap next to the kernels' own compiles.
    """
    yield
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass


# --fast: a quick smoke subset for iteration (<~3 min) — the golden spec
# parity layer plus the cheap unit files.  The full suite stays the
# merge bar; this is for tight edit-test loops (VERDICT round-2 ask).
_FAST_FILES = {
    "test_spec_parity.py",   # 705 reference-generated golden cases
    "test_cigar.py",
    "test_io.py",
    "test_native.py",
    "test_stats.py",
    "test_local.py",
    "test_halo.py",
    "test_gaba.py",
    "test_parasail.py",
    "test_kernel_interpret.py",   # device kernels, interpret mode
    "test_rows.py",               # short-read rows engine
}


def pytest_addoption(parser):
    parser.addoption("--fast", action="store_true", default=False,
                     help="run the quick smoke subset (<~3 min)")


def pytest_collection_modifyitems(config, items):
    if not config.getoption("--fast"):
        return
    selected, deselected = [], []
    for item in items:
        name = os.path.basename(str(item.fspath))
        (selected if name in _FAST_FILES else deselected).append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected
