from __future__ import annotations

import json
import os

import pytest

from crankshaft_spark import get_session

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def spark():
    s = get_session(master="local[4]", app_name="crankshaft_spark_tests",
                    shuffle_partitions=8)
    yield s


def load_fixture(name: str):
    with open(os.path.join(FIXTURE_DIR, name)) as fh:
        return json.load(fh)


@pytest.fixture(scope="session")
def neighbors_fixture():
    return load_fixture("neighbors.json")


@pytest.fixture(scope="session")
def moran_fixture():
    return load_fixture("moran.json")


@pytest.fixture(scope="session")
def getis_neighbors_fixture():
    return load_fixture("neighbors_getis.json")


@pytest.fixture(scope="session")
def getis_fixture():
    return load_fixture("getis.json")


@pytest.fixture(scope="session")
def markov_neighbors_fixture():
    return load_fixture("neighbors_markov.json")


@pytest.fixture(scope="session")
def markov_fixture():
    return load_fixture("markov.json")
