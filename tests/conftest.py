import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from python_vectordbapp_ceph_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def rows_set(df, ndigits: int | None = None):
    """Order-insensitive row set for comparisons."""
    out = set()
    for r in df.collect():
        vals = []
        for v in r:
            if ndigits is not None and isinstance(v, float):
                v = round(v, ndigits)
            vals.append(tuple(v) if isinstance(v, list) else v)
        out.add(tuple(vals))
    return out
