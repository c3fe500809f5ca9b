import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 test plan item f).
#
# The environment's axon sitecustomize registers a remote-TPU PJRT plugin at
# interpreter start and forces jax_platforms="axon,cpu" via jax.config —
# env vars alone can't undo that, so override the config here (backends are
# not initialized yet when conftest runs). Subprocesses spawned by tests
# inherit PALLAS_AXON_POOL_IPS="" which disables the registration entirely.
# snapshot the originals so TPU-hardware tests (tests/test_tpu_hw.py) can
# spawn subprocesses with the real accelerator backend restored
os.environ.setdefault(
    "TDC_ORIG_PALLAS_AXON_POOL_IPS",
    os.environ.get("PALLAS_AXON_POOL_IPS", "__TDC_UNSET__"),
)
os.environ.setdefault(
    "TDC_ORIG_JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", "__TDC_UNSET__")
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: XLA:CPU takes tens of seconds to compile
    # each variadic lax.sort (plateaus ~42 s at >=256k elements), so the
    # sort-heavy staged kernels (device SA, device ESP) are compiled once
    # per machine, not once per test run
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
