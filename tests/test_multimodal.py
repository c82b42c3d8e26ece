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


def test_ppm_round_trip_and_header_edge_cases():
    """The decoder is a real header parser: round-trips arbitrary arrays,
    tolerates comments, rejects truncation and non-P6 payloads."""
    import numpy as np
    import pytest

    from hive_spark.operators.multimodal import _decode_ppm, _encode_ppm

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    assert (_decode_ppm(_encode_ppm(img)) == img).all()

    # comment line in header (legal PPM)
    data = _encode_ppm(img)
    with_comment = data.replace(b"P6\n", b"P6\n# made by a test\n", 1)
    assert (_decode_ppm(with_comment) == img).all()

    with pytest.raises(ValueError, match="truncated"):
        _decode_ppm(data[:-4])
    with pytest.raises(ValueError, match="not a binary PPM"):
        _decode_ppm(b"P5\n1 1\n255\nx")


def test_compressed_codec_still_hard_errors():
    import pytest

    from hive_spark.operators.multimodal import _decode_frame

    with pytest.raises(NotImplementedError, match="jpeg"):
        _decode_frame(b"\xff\xd8\xff", "jpeg")


def test_wav_round_trip_and_chunk_walking():
    import numpy as np
    import pytest

    from hive_spark.operators.multimodal import _decode_wav, _encode_wav

    rng = np.random.default_rng(11)
    s = rng.integers(-32768, 32768, size=333, dtype=np.int16)
    out, rate = _decode_wav(_encode_wav(s, rate=8000))
    assert rate == 8000 and (out == s).all()

    # an extra chunk before data must be skipped, not break the walk
    data = _encode_wav(s)
    with_list = data[:12] + b"LIST\x04\x00\x00\x00INFO" + data[12:]
    out2, _ = _decode_wav(with_list)
    assert (out2 == s).all()

    with pytest.raises(ValueError, match="RIFF"):
        _decode_wav(b"OggS" + bytes(40))
    with pytest.raises(NotImplementedError, match="PCM16 mono"):
        # stereo header
        stereo = bytearray(data)
        stereo[22] = 2
        _decode_wav(bytes(stereo))
