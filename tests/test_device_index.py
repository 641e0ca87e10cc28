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
        np.testing.assert_array_equal(np.asarray(lo_d) - pad, lo_h)


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
