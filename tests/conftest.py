"""Session-scoped Ray fixture — the test suite owns exactly one Ray session."""

from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray
    from ray.data import DataContext

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    yield
    ray.shutdown()


@pytest.fixture()
def tmp_dir():
    d = tempfile.mkdtemp(prefix="cassovary_ray_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def session_tmp():
    d = tempfile.mkdtemp(prefix="cassovary_ray_sess_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
