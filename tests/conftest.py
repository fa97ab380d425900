import pytest

from anomaly_detection_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="adspark-tests", master="local[2]", shuffle_partitions=8)
    yield s
    s.stop()


SPAN = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
DOC_SCHEMA = f"doc_id string, partition_id int, spans {SPAN}"


def make_docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)
