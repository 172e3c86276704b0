"""Test configuration: force an 8-device virtual CPU mesh.

The axon sitecustomize force-selects the TPU tunnel platform via
``jax.config.update("jax_platforms", "axon,cpu")`` at interpreter start, so
an env var alone is not enough — we override the config back to cpu here,
before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def ccdec():
    """Reference standalone decoder built from the read-only mount (shared
    build dir with tests/test_cross_decoder.py)."""
    import subprocess
    import tempfile
    from pathlib import Path

    ref_cpp = Path("/root/reference/coolchic/cpp")
    build_dir = Path(tempfile.gettempdir()) / "ccdec_build_test"
    if not ref_cpp.exists():
        pytest.skip("reference sources not mounted")
    exe = build_dir / "ccdec"
    if not exe.exists():
        build_dir.mkdir(parents=True, exist_ok=True)
        try:
            subprocess.run(
                ["cmake", str(ref_cpp), "-DCMAKE_BUILD_TYPE=Release"],
                cwd=build_dir, check=True, capture_output=True, timeout=300,
            )
            subprocess.run(
                ["make", "-j8"], cwd=build_dir, check=True,
                capture_output=True, timeout=600,
            )
        except Exception as e:  # pragma: no cover - toolchain dependent
            pytest.skip(f"cannot build reference decoder: {e}")
    return exe
