"""Test configuration: run everything on a faked 8-device CPU mesh.

Mirrors the reference's backend-parametrized test architecture
(reference models/tabpfn-extensions/tests/conftest.py:37-203) adapted to
TPU: tests run on CPU with XLA's host-platform device fake so multi-chip
sharding logic is exercised without hardware (SURVEY.md §4 implication).

Set MAD_TEST_TPU=1 to run the suite on real TPU devices instead.
"""

import os

if os.environ.get("MAD_TEST_TPU", "0") != "1":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_collective_timeout_seconds" not in flags:
        # The virtual-device CPU backend hard-aborts the whole process when
        # any of the 8 per-device threads misses a collective rendezvous by
        # 40 s — on the throttled 1-core box a heavily-loaded slow-tier run
        # can starve a thread that long (observed on the 2-D-mesh train
        # step). Raise the termination timeout so starvation shows up as a
        # slow test, not a suite-killing SIGABRT.
        flags = (flags + " --xla_cpu_collective_timeout_seconds=1200").strip()
    os.environ["XLA_FLAGS"] = flags
    # The hosted TPU plugin ignores the env var; force via config too.
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

FAST = os.environ.get("FAST_TEST_MODE", "0") == "1"


def pytest_collection_modifyitems(config, items):
    """FAST_TEST_MODE=1 skips slow tests (mirrors the reference suite's
    fast-mode env switch, tests/conftest.py:25-33 there)."""
    if not FAST:
        return
    skip = pytest.mark.skip(reason="FAST_TEST_MODE=1")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

SMALL_SHAPE = (20, 24, 20)


@pytest.fixture(scope="session")
def adni_dir(tmp_path_factory):
    """Miniature on-disk ADNI dataset (label CSV + NIfTI volumes)."""
    from multimodal_ad_tpu.data.synthetic import make_adni_dir

    root = tmp_path_factory.mktemp("adni")
    csv_path, mri_dir = make_adni_dir(
        str(root), n_per_class=6, classes=("AD", "CN"), shape=SMALL_SHAPE, seed=0)
    return {"label_file": csv_path, "mri_dir": mri_dir, "shape": SMALL_SHAPE}


@pytest.fixture(scope="session")
def clinical_table(tmp_path_factory):
    from multimodal_ad_tpu.data.synthetic import make_table

    root = tmp_path_factory.mktemp("table")
    df = make_table(n=80, classes=("CN", "AD", "SMCI", "PMCI"), seed=1)
    path = str(root / "ADNI_Tabel.csv")
    df.to_csv(path, index=False)
    return path


@pytest.fixture(scope="session")
def mesh8():
    import jax
    from multimodal_ad_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (faked) devices")
    return make_mesh({"data": -1})


@pytest.fixture()
def rng():
    return np.random.default_rng(42)
