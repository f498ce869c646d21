from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.fixture(scope="session")
def spark():
    from kaggle_data_pipeline_with_aws_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark_session():
    """Alias fixture for property tests (hypothesis forbids reusing
    function-scoped fixtures across examples; session scope is safe)."""
    from kaggle_data_pipeline_with_aws_spark.session import get_spark

    return get_spark("tests", shuffle_partitions=8)
