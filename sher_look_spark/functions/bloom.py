"""Salted-partition bloom filter for the URL-seen set (SURVEY §4, north-star
"salted-partition bloom/cuckoo URL-seen set").

Why: at 10^10 seen URLs the exact `seen` table cannot be shuffled every wave.
The reference layers a cheap in-memory check in front of the DB lookup
(crawler/CrawlTask.java:82-93); the distributed analog is:

1. maintain one bloom bitmap per salt partition (``salt = url_hash mod
   n_salts``), built/merged incrementally from each wave's seen additions;
2. per wave, test candidates against their salt's bitmap in an Arrow batch —
   a "definitely new" answer (the overwhelming majority on a real crawl)
   skips the exact check entirely;
3. only "maybe seen" candidates (true dups + ~fp_rate of the rest) proceed to
   the exact check, which the engine executes as a broadcast semi-join
   against the seen table — the big table is scanned, never shuffled, and
   the bloom is a pre-filter only, so results stay EXACT.

Sizing: bits/salt and n_salts are config; the sandbox default (32 salts x
1 MiB bits) holds ~2.8M urls at 1% fp. At 10^10 urls: 4096 salts x 2^33 bits
≈ 4 TiB aggregate, sharded one salt-bitmap per executor — which is exactly
why the filter is salt-partitioned rather than monolithic.

All bit math is numpy over uint64 (Arrow batches); the per-element k probe
positions use Kirsch-Mitzenmacher double hashing pos_j = h1 + j*h2 (two
splitmix64-style mixes of the 64-bit url hash), the standard construction
with false-positive behavior equivalent to k independent hashes.
"""

from __future__ import annotations

import numpy as np

_K = 4  # probe count; with m/n >= 12 bits/key, fp ~ 1%

_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix(h: np.ndarray, c1: np.uint64, c2: np.uint64) -> np.ndarray:
    x = h * c1  # uint64 wraps mod 2^64
    x ^= x >> np.uint64(33)
    x *= c2
    x ^= x >> np.uint64(29)
    return x


def _probe_positions(hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """(len(hashes), K) bit positions via double hashing."""
    h = hashes.astype(np.uint64)
    h1 = _mix(h, _C1, _C2)
    h2 = _mix(h, _C2, _C1) | np.uint64(1)
    j = np.arange(_K, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(np.int64)


def empty_bitmap(n_bits: int) -> np.ndarray:
    return np.zeros(n_bits // 8, dtype=np.uint8)


def add_hashes(bitmap: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Set the probe bits for `hashes` in `bitmap` (mutates + returns it)."""
    if len(hashes) == 0:
        return bitmap
    pos = _probe_positions(np.asarray(hashes), len(bitmap) * 8).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
    return bitmap


def might_contain(bitmap: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Vectorized membership test -> bool array (no false negatives)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = _probe_positions(np.asarray(hashes), len(bitmap) * 8)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def merge_bitmaps(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.bitwise_or(a, b)


def salt_of(hashes: np.ndarray, n_salts: int) -> np.ndarray:
    """Salt assignment = pmod(signed int64 hash, n_salts) — IDENTICAL to the
    engine's JVM-side ``F.pmod(url_hash, n_salts)`` (numpy mod on int64 with a
    positive divisor is already non-negative, matching pmod). Probe positions
    (`_probe_positions`) use the raw 64-bit pattern, which is sign-agnostic."""
    return np.mod(np.asarray(hashes).astype(np.int64), np.int64(n_salts))


def build_salted(hashes: np.ndarray, n_salts: int, n_bits: int) -> dict[int, bytes]:
    """Driver/executor helper: {salt: bitmap bytes} for a batch of hashes."""
    h = np.asarray(hashes, dtype=np.uint64)
    salts = salt_of(h, n_salts)
    out: dict[int, bytes] = {}
    for s in np.unique(salts):
        bm = empty_bitmap(n_bits)
        add_hashes(bm, h[salts == s])
        out[int(s)] = bm.tobytes()
    return out
