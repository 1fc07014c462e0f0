"""Test configuration: run the whole suite on a virtual 8-device CPU mesh so
multi-chip sharding paths compile and execute without TPU hardware (the
driver separately dry-runs the multichip path)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may point at a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# Keep CPU-run commitments/MSMs on the exact host path up to K=12-ish
# sizes: the device MSM/group-NTT graphs at n >= 2048 are compile-bound
# (tens of minutes cold), which starved the K=11 parity tests.
os.environ.setdefault("HALO2_TPU_HOST_MSM_THRESHOLD", "4096")

import jax  # noqa: E402

# The axon sitecustomize pre-imports jax with JAX_PLATFORMS=axon, so the
# env var above is too late — override via config (the backend itself is
# not initialized until first use, so this still takes effect).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-arithmetic graphs are large and
# compile-bound; cache them across test processes. Scoped per-platform:
# axon remote-compiled CPU AOT entries carry machine-feature flags that
# can mis-execute on the host (cpu_aot_loader SIGILL warnings).
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               ".jax_cache", "cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)


# The K=11 gadget-parity tests each compile large per-shape executables;
# keeping every executable alive for a whole single-process `pytest
# tests/` run grows to >100 GB RSS (the CPU backend was OOM-killed at
# 119 GB).  Clearing jax's in-memory caches between tests caps the
# footprint; the persistent on-disk cache makes recompiles cheap.
import pytest  # noqa: E402

_HEAVY_PREFIXES = ("test_gadget_vk_parity", "test_merkle_parity",
                   "test_plonk_api_parity", "test_golden",
                   "test_sinsemilla", "test_sha256", "test_mesh_prover",
                   "test_ipa_device", "test_parallel", "test_msm_pallas",
                   "test_table16", "test_batch_synthesis")


@pytest.fixture(autouse=True)
def _clear_jax_caches_after_heavy_tests(request):
    yield
    module = request.node.module.__name__ if request.node.module else ""
    if any(module.startswith(p) for p in _HEAVY_PREFIXES):
        jax.clear_caches()
