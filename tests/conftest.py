import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from engine.session import get_spark

    s = get_spark("engine-tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from engine.session import load_tables

    return load_tables(spark, SF_SMOKE)


@pytest.fixture(scope="session")
def clips_path(tmp_path_factory):
    from engine.synth import write_clips_parquet

    path = str(tmp_path_factory.mktemp("clips") / "clips.parquet")
    write_clips_parquet(path, n_clips=600, seed=42)
    return path


@pytest.fixture(scope="session")
def clips_df(spark, clips_path):
    return spark.read.parquet(clips_path)
