"""Multi-device equivalence tests on an 8-device virtual CPU mesh.

What the reference never needed (single process) and SURVEY.md §4 requires
of the TPU build: N-shard screening equals single-device screening, and the
psum-merged vote tensors equal the serial elect result exactly.
"""

import numpy as np
import pytest

import jax

from pacbioassembly_tpu.align.scan import batch_score
from pacbioassembly_tpu.align.types import DELETE, INSERT, MATCH
from pacbioassembly_tpu.consensus import ConsensusRef
from pacbioassembly_tpu.parallel import (
    assembly_step,
    make_mesh,
    sharded_elect,
    sharded_screen,
)

from test_scan import make_cases, pack


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(8)


def test_sharded_screen_equals_single(mesh):
    rng = np.random.default_rng(31)
    cases = make_cases(rng, 32, max_len=48)
    LA, LB, W = 56, 56, 20
    A, las, Bm, lbs = pack(cases, LA, LB)
    single = batch_score(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    sharded = sharded_screen(mesh, A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    for f in ["accept", "cost", "matlen_a", "matlen_b", "diag_cost"]:
        np.testing.assert_array_equal(
            np.asarray(getattr(single, f)), np.asarray(getattr(sharded, f)), f
        )


def _random_edit_streams(rng, n, L, E):
    """Random plausible edit streams with start positions such that walks
    stay inside [0, L)."""
    ops = np.zeros((n, E), np.uint8)
    vals = np.zeros((n, E), np.uint8)
    start = np.zeros(n, np.int32)
    forward = np.zeros(n, bool)
    for i in range(n):
        ne = int(rng.integers(4, E))
        # cap non-insert count so the walk stays in range
        o = rng.choice([MATCH, MATCH, MATCH, DELETE, INSERT], size=ne)
        o[0] = MATCH  # first edit cannot be INSERT (ref_seq.h:24)
        nonins = int((o != INSERT).sum())
        fwd = bool(rng.integers(0, 2))
        if fwd:
            s = int(rng.integers(0, max(1, L - nonins)))
        else:
            s = int(rng.integers(min(L - 1, nonins), L))
        ops[i, :ne] = o
        vals[i, :ne] = rng.integers(0, 4, ne)
        start[i] = s
        forward[i] = fwd
    return ops, vals, start, forward


def test_sharded_elect_equals_serial(mesh):
    rng = np.random.default_rng(7)
    L, E, N = 200, 24, 32
    ops, vals, start, forward = _random_edit_streams(rng, N, L, E)
    enabled = rng.integers(0, 2, N).astype(bool)

    # serial: ConsensusRef.elect
    base = np.zeros(L, np.uint8)
    ref = ConsensusRef(base, capacity=3 * L)
    sel0 = ref.sel[ref.pre : ref.post].copy()
    sup0 = ref.sup[ref.pre : ref.post].copy()
    tot0 = ref.total[ref.pre : ref.post].copy()
    for i in range(N):
        if not enabled[i]:
            continue
        ne = int((ops[i] != 0).sum())
        ref.elect(int(start[i]), ops[i, :ne], vals[i, :ne], bool(forward[i]))
    want_sel = ref.sel[ref.pre : ref.post] - sel0
    want_sup = ref.sup[ref.pre : ref.post] - sup0
    want_tot = ref.total[ref.pre : ref.post] - tot0

    delta = sharded_elect(mesh, ops, vals, start, forward, enabled, L)
    np.testing.assert_array_equal(np.asarray(delta.sel), want_sel)
    np.testing.assert_array_equal(np.asarray(delta.sup), want_sup)
    np.testing.assert_array_equal(np.asarray(delta.total), want_tot)


def test_assembly_step_runs_on_mesh(mesh):
    rng = np.random.default_rng(5)
    cases = make_cases(rng, 16, max_len=40)
    LA, LB, W = 48, 48, 16
    A, las, Bm, lbs = pack(cases, LA, LB)
    L, E = 128, 16
    ops, vals, start, forward = _random_edit_streams(rng, 16, L, E)
    scores, votes, n_accept = assembly_step(
        mesh, A, las, Bm, lbs, ops, vals, start, forward,
        la_max=LA, w_max=W, L=L, overlap_min=8,
    )
    single = batch_score(A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    ok = np.asarray(single.accept) & (np.asarray(single.matlen_a) >= 8)
    assert int(n_accept) == int(ok.sum())
    np.testing.assert_array_equal(np.asarray(scores.accept), np.asarray(single.accept))
    assert np.asarray(votes.sel).shape == (L, 4)


def test_shard_sizes_balance_across_device_counts():
    """The perf property a pod run needs that is measurable without
    hardware (VERDICT r4 item 6): the engine pads every sharded screening
    batch so each device receives EXACTLY the same row count (shard_map
    P("dp") requires divisibility; imbalance would idle devices), and the
    ladder padding overhead is bounded (< 2x above the per-device
    quantum floor)."""
    from pacbioassembly_tpu.align.screen import ladder_size

    for n_dev in (2, 4, 8):
        q = 64 * n_dev  # BatchAssembler._score's per-device quantum
        for B in (1, 63, 64, 100, 511, 512, 1000, 4096, 5000):
            Bp = ladder_size(B, q)
            assert Bp % n_dev == 0, (n_dev, B, Bp)
            per_dev = Bp // n_dev
            assert per_dev % 64 == 0, "sublane-group quantum violated"
            assert Bp >= B
            assert Bp < 2 * max(B, q), f"padding overhead unbounded: {B}->{Bp}"


def test_sharded_screen_per_device_shards_equal(mesh):
    """The materialized sharding really places equal-size row blocks on
    every device (addressable_shards inspection, 8-dev CPU mesh)."""
    rng = np.random.default_rng(33)
    cases = make_cases(rng, 64, max_len=48)
    LA, LB, W = 56, 56, 20
    A, las, Bm, lbs = pack(cases, LA, LB)
    res = sharded_screen(mesh, A, las, Bm, lbs, la_max=LA, w_max=W, ratio=0.3)
    shards = res.accept.addressable_shards
    assert len(shards) == 8
    sizes = sorted(s.data.shape[0] for s in shards)
    assert sizes == [64 // 8] * 8, sizes
