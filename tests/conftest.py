import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from longqc_spark.corpus import generate_corpus, write_corpus  # noqa: E402
from longqc_spark.session import get_spark  # noqa: E402

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
DATA_CC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data_cc")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("longqc-tests", cores=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf() -> pd.DataFrame:
    return generate_corpus(1_000, seed=42)


@pytest.fixture(scope="session")
def corpus_path() -> str:
    return write_corpus(DATA_CC, "smoke")


@pytest.fixture(scope="session")
def sf001() -> str:
    return os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def sf01() -> str:
    return os.path.join(TESTDATA, "sf0.01")
