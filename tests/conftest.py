"""Test configuration: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

Note: this environment's sitecustomize registers a remote 'axon' TPU backend
and pins JAX_PLATFORMS=axon; plain env-var overrides are not enough, so we
also update jax.config after import (which wins over the env pin).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"

# ---------------------------------------------------------------------------
# torch / XLA-CPU coexistence.
#
# Executing torch CPU kernels mid-suite corrupts native state that a LATER
# large XLA-CPU compile trips over: with the default interleaving the suite
# segfaulted deterministically inside backend_compile_and_load during
# test_tta's big multi-scale program (reproduced twice; the same tests pass
# in any order that keeps heavy jax compiles ahead of torch execution, and a
# torch-free run of the remaining 232 tests is clean). Two mitigations:
#
#  * single-thread torch (its OMP/MKL pools are the prime suspect for
#    stomping the compiler's threads)
#  * order collected items so files that EXECUTE torch run after all
#    torch-free files — preserving relative order within each group
# ---------------------------------------------------------------------------
try:  # torch is optional for the non-golden part of the suite
    import torch as _torch

    _torch.set_num_threads(1)
    _torch.set_num_interop_threads(1)
except Exception:  # noqa: BLE001 — absent/misconfigured torch is fine
    pass

_TORCH_FILES = {
    "test_convert_mpn.py", "test_convert_parity.py", "test_losses.py",
    "test_ref_composite_golden.py", "test_ref_decode_golden.py",
    "test_ref_group_hg_golden.py", "test_ref_hourglass_golden.py",
    "test_ref_labels_golden.py", "test_ref_losses_golden.py",
    "test_ref_mmpose_golden.py", "test_ref_mpn_golden.py",
    "test_ref_mpn_variants_golden.py", "test_tta_projection_golden.py",
    "test_backbones.py",
}


def pytest_collection_modifyitems(config, items):
    items.sort(key=lambda it: it.fspath.basename in _TORCH_FILES)
