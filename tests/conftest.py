import pytest

from aardvark_geometry_quadtree_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="qt-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def q10x7(spark):
    """The reference's canonical 10x7 e=0 split=2 grid, value = x + y/100
    (Tests/QueryTests.fs:12-23)."""
    from aardvark_geometry_quadtree_spark.sources.grids import grid

    return grid(spark, 0, 0, 10, 7, e=0, pattern="xy").cache()
