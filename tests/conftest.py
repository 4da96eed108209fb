import pytest

from pdf2pdfocr_spark.pipeline import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app="pdf2pdfocr_spark_tests", master="local[4]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
