"""Device seed index equals the host CSR index (keys, bucket order, counts)."""

import numpy as np
import jax.numpy as jnp

from pacbioassembly_tpu.codec import dna
from pacbioassembly_tpu.index import build_seedmap
from pacbioassembly_tpu.index.device import device_build_seedmap, device_lookup


def test_device_index_matches_host():
    rng = np.random.default_rng(3)
    L = 3000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    codes[100:130] = 3  # a poly-T run (sentinel-collision regression)
    for mask in [0xFFFFFFFF, dna.parse_pattern("111**111*11*1111")]:
        host, n_indexed = build_seedmap(codes, mask)
        dev = device_build_seedmap(jnp.asarray(codes), jnp.int32(L), mask)
        n = int(dev.n_entries)
        assert n == host.n_entries
        # padding (key 0) sorts first; live entries are the tail
        np.testing.assert_array_equal(np.asarray(dev.keys[-n:]), host.keys)
        np.testing.assert_array_equal(np.asarray(dev.positions[-n:]), host.positions)

        # batch lookups agree, including the poly-T key and a miss
        queries = np.concatenate(
            [host.keys[::97], [np.uint32(0xFFFFFFFF & mask)], [np.uint32(12345)]]
        )
        lo_h, cnt_h = host.lookup_batch(queries)
        lo_d, cnt_d = device_lookup(dev, jnp.asarray(queries))
        np.testing.assert_array_equal(np.asarray(cnt_d), cnt_h)
        pad = dev.keys.shape[0] - n
        # starts compare only where cnt > 0 (miss rows have unspecified
        # start since the host index moved to hash-probe lookups)
        hit = cnt_h > 0
        np.testing.assert_array_equal(
            (np.asarray(lo_d) - pad)[hit], lo_h[hit]
        )


def test_host_lookup_batch_equals_binary_search():
    """The hash-probe lookup_batch is bit-equivalent to the two-searchsorted
    definition over random key sets (incl. heavy duplication and empty
    indexes)."""
    from pacbioassembly_tpu.index.seedmap import SeedIndex

    rng = np.random.default_rng(9)
    for trial in range(25):
        n = int(rng.integers(0, 3000))
        space = 1 << int(rng.integers(4, 32))
        raw = rng.integers(0, space, n, dtype=np.uint32)
        order = np.argsort(raw, kind="stable")
        idx = SeedIndex(raw[order], np.arange(n, dtype=np.int32)[order])
        q = rng.integers(0, space, 4000, dtype=np.uint32)
        if n:
            q[:500] = rng.choice(raw, 500)
        s, c = idx.lookup_batch(q)
        lo = np.searchsorted(idx.keys, q, side="left")
        hi = np.searchsorted(idx.keys, q, side="right")
        np.testing.assert_array_equal(c, hi - lo, err_msg=str(trial))
        hitq = c > 0
        np.testing.assert_array_equal(s[hitq], lo[hitq], err_msg=str(trial))


def test_device_index_boundary_windows():
    """Long reference: head + tail windows only (ref_seq.h:291-311)."""
    rng = np.random.default_rng(4)
    L = 45_000
    codes = rng.integers(0, 4, L).astype(np.uint8)
    host, n_indexed = build_seedmap(codes, 0xFFFFFFFF)
    dev = device_build_seedmap(jnp.asarray(codes), jnp.int32(L), 0xFFFFFFFF)
    n = int(dev.n_entries)
    assert n == host.n_entries == n_indexed  # no zero-masked windows likely
    np.testing.assert_array_equal(np.asarray(dev.keys[-n:]), host.keys)
    np.testing.assert_array_equal(np.asarray(dev.positions[-n:]), host.positions)
