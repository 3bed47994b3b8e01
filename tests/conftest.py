import os
import shutil

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # keep test JVM small


@pytest.fixture(scope="session")
def spark():
    from openpoiservice_spark.session import get_spark

    s = get_spark(app="opss-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def fixture_paths(tmp_path_factory, spark):
    """Synthesize the raw poi_images table + run the import once per session."""
    from openpoiservice_spark import fixtures, prepare

    root = tmp_path_factory.mktemp("poi")
    raw = str(root / "raw.parquet")
    prepared = str(root / "prepared")
    fixtures.build_sf_test(raw, n_filler=2000)
    stats = prepare.prepare(spark, raw, prepared)
    assert stats["rows"] > 0
    return {"raw": raw, "prepared": prepared}


@pytest.fixture(scope="session")
def engine(spark, fixture_paths):
    from openpoiservice_spark.api import PoiEngine

    return PoiEngine(spark, fixture_paths["prepared"])
