import pytest


@pytest.fixture(scope="session")
def spark():
    from gtfs_to_geojson_spark.session import get_spark

    s = get_spark(
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def feed_pd():
    from gtfs_to_geojson_spark import synth

    return synth.make_gtfs_feed()


@pytest.fixture(scope="session")
def feed(spark, feed_pd):
    from gtfs_to_geojson_spark.sources.gtfs import feed_from_pandas

    return feed_from_pandas(spark, feed_pd)


@pytest.fixture(scope="session")
def images_pd():
    from gtfs_to_geojson_spark import synth

    return synth.make_images(n=90)


@pytest.fixture(scope="session")
def images_df(spark, images_pd):
    return spark.createDataFrame(
        images_pd,
        schema="image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
