"""functions/bloom.py: no false negatives ever, bounded false positives,
salted build/merge round-trips through bytes."""

from __future__ import annotations

import numpy as np

from sher_look_spark.functions import bloom


def test_no_false_negatives_and_low_fp():
    rng = np.random.Generator(np.random.PCG64(7))
    seen = rng.integers(0, 2**60, size=200_000, dtype=np.uint64)
    other = rng.integers(0, 2**60, size=50_000, dtype=np.uint64)
    bm = bloom.empty_bitmap(1 << 23)  # 1 MiB -> ~42 bits/key here
    bloom.add_hashes(bm, seen)
    assert bloom.might_contain(bm, seen).all(), "bloom false negative"
    fp = bloom.might_contain(bm, other).mean()
    assert fp < 0.01, fp


def test_salted_build_merge_bytes_roundtrip():
    rng = np.random.Generator(np.random.PCG64(8))
    a = rng.integers(0, 2**60, size=40_000, dtype=np.uint64)
    b = rng.integers(0, 2**60, size=40_000, dtype=np.uint64)
    n_salts, n_bits = 8, 1 << 20
    da = bloom.build_salted(a, n_salts, n_bits)
    db = bloom.build_salted(b, n_salts, n_bits)
    merged = {}
    for s in range(n_salts):
        bms = [np.frombuffer(d[s], dtype=np.uint8) for d in (da, db) if s in d]
        out = bms[0].copy()
        for extra in bms[1:]:
            out = bloom.merge_bitmaps(out, extra)
        merged[s] = out
    for h in np.concatenate([a, b])[::97]:
        s = int(h) % n_salts
        assert bloom.might_contain(merged[s], np.array([h], dtype=np.uint64))[0]


def test_empty_inputs():
    bm = bloom.empty_bitmap(1 << 16)
    assert bloom.add_hashes(bm, np.array([], dtype=np.uint64)) is bm
    assert bloom.might_contain(bm, np.array([], dtype=np.uint64)).shape == (0,)
    assert not bloom.might_contain(bm, np.array([123], dtype=np.uint64))[0]
