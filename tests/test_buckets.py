"""Bucket tables must match the reference's hand-written tables exactly."""

import numpy as np

from diffsensei_tpu.core.buckets import (
    SIZE_BUCKETS,
    all_bucket_shapes,
    get_bucket_size,
    make_bucket_table,
    snap_to_bucket,
)

# Reference table for the 512 class (src/datasets/utils.py:45-81), used as the
# golden fixture; the 256/1024 classes are asserted as exact 0.5x/2x scalings.
REFERENCE_512 = [
    [256, 1024], [256, 992], [272, 960], [288, 928], [288, 896], [304, 864],
    [320, 832], [320, 800], [336, 768], [352, 736], [368, 704], [384, 672],
    [416, 640], [432, 608], [448, 576], [480, 544], [512, 512], [544, 480],
    [576, 448], [608, 432], [640, 416], [672, 384], [704, 368], [736, 352],
    [768, 336], [800, 320], [832, 320], [864, 304], [896, 288], [928, 288],
    [960, 272], [992, 256], [1024, 256],
]


def test_512_table_matches_reference():
    table = make_bucket_table(512)
    assert [[h, w] for h, w, _ in table] == REFERENCE_512


def test_scaled_classes():
    t512 = make_bucket_table(512)
    t256 = make_bucket_table(256)
    t1024 = make_bucket_table(1024)
    for (h5, w5, _), (h2, w2, _), (h10, w10, _) in zip(t512, t256, t1024):
        assert (h2, w2) == (h5 // 2, w5 // 2)
        assert (h10, w10) == (h5 * 2, w5 * 2)


def test_all_tables_are_33_rows_mod8():
    for sb in SIZE_BUCKETS:
        assert len(sb["buckets"]) == 33
        for h, w, r in sb["buckets"]:
            assert h % 8 == 0 and w % 8 == 0
            assert abs(r - h / w) < 1e-9
            assert 0.25 <= r <= 4.0


def test_get_bucket_size_selects_nearest():
    # exact hit
    assert get_bucket_size(512, 512) == (512, 512, 1)
    # 1000x1000 -> nearest area class 1024, square ratio
    assert get_bucket_size(1000, 1000) == (1024, 1024, 2)
    # wide panel near 256 class
    h, w, idx = get_bucket_size(140, 500)
    assert idx == 0
    assert h / w < 0.5


def test_ratio_selection_matches_reference_algorithm():
    rng = np.random.default_rng(0)
    for _ in range(200):
        hh = int(rng.integers(64, 2048))
        ww = int(rng.integers(64, 2048))
        h, w, idx = get_bucket_size(hh, ww)
        # re-implementation of src/datasets/utils.py:191-206
        sizes = [sb["size"] ** 2 for sb in SIZE_BUCKETS]
        ci = int(np.argmin([abs(hh * ww - s) for s in sizes]))
        buckets = np.array(SIZE_BUCKETS[ci]["buckets"])
        bi = int(np.argmin(np.abs(hh / ww - buckets[:, 2])))
        assert (h, w, idx) == (int(buckets[bi][0]), int(buckets[bi][1]), ci)


def test_snap_to_bucket():
    assert snap_to_bucket(512, 512) == (512, 512)
    assert snap_to_bucket(1030, 1020) == (1024, 1024)


def test_bucket_keyspace_is_bounded():
    assert len(all_bucket_shapes()) <= 99
