import json
from pathlib import Path

import pytest

GOLDENS = Path(__file__).parent / "goldens"


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (driver contract)."""
    import ray
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    yield
    ray.shutdown()


def load_golden(name: str):
    return json.loads((GOLDENS / name).read_text())


@pytest.fixture(scope="session")
def golden_textnorm():
    return load_golden("textnorm.json")


@pytest.fixture(scope="session")
def golden_predicates():
    return load_golden("predicates.json")


@pytest.fixture(scope="session")
def golden_language():
    return load_golden("language.json")


@pytest.fixture(scope="session")
def golden_validation():
    return load_golden("validation.json")


@pytest.fixture(scope="session")
def golden_documents():
    return load_golden("documents.json")
