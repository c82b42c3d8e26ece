"""UDF/UDTF/UDAF/PTF extension surface vs DuckDB oracle."""

import pytest

from hive_spark.operators import extension
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(extension.REGISTRY))
def test_extension_oracle(spark, sf_dir, name):
    spec = extension.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)
