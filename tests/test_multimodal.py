"""Multimodal binary-column pipeline vs DuckDB oracle."""

import pytest

from hive_spark.operators import multimodal
from tests.oracle_check import compare


@pytest.mark.parametrize("name", sorted(multimodal.REGISTRY))
def test_multimodal_oracle(spark, sf_dir, name):
    spec = multimodal.REGISTRY[name]
    compare(spec.fn(spark, sf_dir), spec.oracle, sf_dir)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal._decode_frame(b"xx", "jpeg")
