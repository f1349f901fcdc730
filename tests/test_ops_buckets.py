"""Bucket math: exact values mirroring the reference prep rules."""
import pytest

from ragb_vae_tpu.ops import (
    MAX_PIXELS,
    MAX_SIDE,
    bucket_assignment,
    bucket_for_size,
    format_bucket_key,
    parse_bucket_dims,
    round_to_multiple,
    should_exclude_size,
)


def test_round_to_multiple():
    assert round_to_multiple(63) == 64
    assert round_to_multiple(96) == 128  # round-half-even on 1.5 -> 2
    assert round_to_multiple(95) == 64
    assert round_to_multiple(1) == 64
    assert round_to_multiple(640) == 640


def test_should_exclude_size():
    assert should_exclude_size(100, 1000) == "too_small"
    assert should_exclude_size(384, 884) == "extreme_aspect_ratio"  # 884/384 = 2.302 >= 2.3
    assert should_exclude_size(500, 1000) is None


def test_bucket_for_size_no_scaling_needed():
    assert bucket_for_size(512, 512) == (512, 512)
    assert bucket_for_size(640, 640) == (640, 640)


def test_bucket_for_size_caps_pixels():
    w, h = bucket_for_size(2048, 2048)
    assert w == h
    assert w * h <= MAX_PIXELS + 64 * 64  # rounding slack of one multiple
    # sqrt(1408*768) = 1039.6 -> rounds to 1024
    assert (w, h) == (1024, 1024)


def test_bucket_for_size_caps_side():
    w, h = bucket_for_size(4000, 1800)
    assert max(w, h) <= MAX_SIDE
    assert w * h <= MAX_PIXELS + 64 * 64


def test_bucket_assignment_and_keys():
    assigned, reason = bucket_assignment((512, 768))
    assert reason is None
    key, dims = assigned
    assert key == format_bucket_key(*dims)
    assert parse_bucket_dims(key) == dims

    assigned, reason = bucket_assignment((10, 10))
    assert assigned is None and reason == "too_small"
    assigned, reason = bucket_assignment((0, 10))
    assert assigned is None and reason == "invalid_dimensions"


def test_parse_bucket_dims():
    assert parse_bucket_dims("w1024-h768") == (1024, 768)
    with pytest.raises(ValueError):
        parse_bucket_dims("1024x768")
    with pytest.raises(ValueError):
        parse_bucket_dims("w10-h")
