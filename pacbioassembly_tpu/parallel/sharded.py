"""Sharded screening + collective vote merge (shard_map over a 1-D mesh).

This is the multi-chip form of one assembly round (the "training step" of
this engine):

  * candidate alignments shard across the "dp" axis — screening is
    embarrassingly parallel (the per-shard kernel is scan/pallas from
    align/);
  * vote application (elect) runs shard-locally as scatter-adds over
    (L, 4) int32 tensors and merges with jax.lax.psum — votes are
    commutative integer sums, so the merged result is exactly the serial
    result regardless of shard order (tests/test_sharding.py asserts
    equality with ConsensusRef.elect);
  * accepted-read flags are implicitly all-gathered by the psum'd outputs
    being replicated.

The reference has no parallelism at all (single process, one big loop —
spaced_seed.cpp:420-439); this module is the new first-class component
SURVEY.md §2.4 calls for.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..align.scan import BatchScores, batch_score
from ..align.types import DELETE, INSERT, MATCH
from ..config import Constants


class VoteDelta(NamedTuple):
    sel: jax.Array    # (L, 4) int32
    sup: jax.Array    # (L, 4) int32
    total: jax.Array  # (L,) int32


def device_elect(
    ops: jax.Array,       # (N, E) uint8 edit opcodes, 0-padded
    vals: jax.Array,      # (N, E) uint8 b-side codes
    start: jax.Array,     # (N,) int32 start box index (elect pos + beg - pre)
    forward: jax.Array,   # (N,) bool direction
    enabled: jax.Array,   # (N,) bool apply this stream at all
    L: int,
) -> VoteDelta:
    """Vectorized elect (ref_seq.h:25-41, 352-362) for N edit streams into
    (L, 4) vote tensors. Pure scatter-adds -> commutative -> psum-mergeable."""
    ops = ops.astype(jnp.int32)
    vals = vals.astype(jnp.int32)
    adv = (ops != INSERT).astype(jnp.int32) * (ops != 0).astype(jnp.int32)
    nonins_before = jnp.cumsum(adv, axis=1) - adv  # exclusive prefix
    fwd = forward[:, None]
    idx = jnp.where(fwd, start[:, None] + nonins_before, start[:, None] - nonins_before)
    idx = jnp.where(fwd & (ops == INSERT), idx - 1, idx)
    live = enabled[:, None] & (ops != 0)
    idx = jnp.clip(idx, 0, L - 1)

    is_m = live & (ops == MATCH)
    is_d = live & (ops == DELETE)
    is_i = live & (ops == INSERT)

    sel = jnp.zeros((L, 4), jnp.int32)
    sup = jnp.zeros((L, 4), jnp.int32)
    total = jnp.zeros(L, jnp.int32)

    flat_idx = idx.reshape(-1)
    flat_vals = vals.reshape(-1)
    sel = sel.at[flat_idx, flat_vals].add(is_m.reshape(-1).astype(jnp.int32))
    sup = sup.at[flat_idx, flat_vals].add(is_i.reshape(-1).astype(jnp.int32))
    total = total.at[flat_idx].add((is_m | is_d).reshape(-1).astype(jnp.int32))
    return VoteDelta(sel, sup, total)


@functools.lru_cache(maxsize=None)
def _sharded_screen_fn(mesh: Mesh, la_max: int, w_max: int, ratio: float, backend: str):
    """Jitted sharded screen, cached per (mesh, geometry, backend) so
    repeated rounds reuse the compiled executable instead of retracing a
    fresh closure every call."""

    def kernel(a_s, la_s, b_s, lb_s):
        if backend == "bitpallas":
            from ..align.bitwave import batch_score_bitpallas

            return batch_score_bitpallas(
                a_s, la_s, b_s, lb_s, la_max=la_max, w_max=w_max, ratio=ratio
            )
        if backend == "pallas":
            from ..align.wavefront import batch_score_pallas

            return batch_score_pallas(
                a_s, la_s, b_s, lb_s, la_max=la_max, w_max=w_max, ratio=ratio
            )
        return batch_score(a_s, la_s, b_s, lb_s, la_max=la_max, w_max=w_max, ratio=ratio)

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P("dp", None), P("dp")),
        out_specs=BatchScores(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
    )
    return jax.jit(fn)


def sharded_screen(
    mesh: Mesh,
    a: jax.Array,
    la: jax.Array,
    b: jax.Array,
    lb: jax.Array,
    *,
    la_max: int,
    w_max: int,
    ratio: float = Constants.MAXR,
    backend: str = "scan",
) -> BatchScores:
    """Screen candidates sharded over the dp axis. Batch size must be a
    multiple of mesh size; outputs are sharded the same way."""
    return _sharded_screen_fn(mesh, la_max, w_max, ratio, backend)(a, la, b, lb)


@functools.lru_cache(maxsize=None)
def _sharded_elect_fn(mesh: Mesh, L: int):
    def kernel(ops_s, vals_s, start_s, fwd_s, en_s):
        delta = device_elect(ops_s, vals_s, start_s, fwd_s, en_s, L)
        return VoteDelta(
            jax.lax.psum(delta.sel, "dp"),
            jax.lax.psum(delta.sup, "dp"),
            jax.lax.psum(delta.total, "dp"),
        )

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp"), P("dp"), P("dp")),
        out_specs=VoteDelta(P(), P(), P()),
    )
    return jax.jit(fn)


def sharded_elect(
    mesh: Mesh,
    ops: jax.Array,
    vals: jax.Array,
    start: jax.Array,
    forward: jax.Array,
    enabled: jax.Array,
    L: int,
) -> VoteDelta:
    """Apply sharded edit streams and psum-merge the vote tensors; the
    result is replicated on every device and equals the serial elect."""
    return _sharded_elect_fn(mesh, L)(ops, vals, start, forward, enabled)


@functools.lru_cache(maxsize=None)
def jit_elect(L: int):
    """Single-device jitted device_elect with static window length L
    (callers ladder L so only a handful of shapes ever compile)."""
    return jax.jit(functools.partial(device_elect, L=L))


def _pack_delta(d: VoteDelta) -> jax.Array:
    """(L, 9) int32 [sel | sup | total] — one fetch instead of three."""
    return jnp.concatenate([d.sel, d.sup, d.total[:, None]], axis=1)


@functools.lru_cache(maxsize=None)
def jit_elect_packed(L: int):
    """device_elect returning the packed (L, 9) delta (one host fetch)."""

    def fn(ops, vals, start, forward, enabled):
        return _pack_delta(device_elect(ops, vals, start, forward, enabled, L))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _sharded_elect_packed_fn(mesh: Mesh, L: int):
    def kernel(ops_s, vals_s, start_s, fwd_s, en_s):
        d = device_elect(ops_s, vals_s, start_s, fwd_s, en_s, L)
        return jax.lax.psum(_pack_delta(d), "dp")

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P("dp", None), P("dp", None), P("dp"), P("dp"), P("dp")),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_elect_packed(mesh, ops, vals, start, forward, enabled, L):
    """sharded_elect returning the packed (L, 9) psum-merged delta."""
    return _sharded_elect_packed_fn(mesh, L)(ops, vals, start, forward, enabled)


def assembly_step(
    mesh: Mesh,
    a: jax.Array,
    la: jax.Array,
    b: jax.Array,
    lb: jax.Array,
    ops: jax.Array,
    vals: jax.Array,
    start: jax.Array,
    forward: jax.Array,
    *,
    la_max: int,
    w_max: int,
    L: int,
    ratio: float = Constants.MAXR,
    overlap_min: int = Constants.OVERLAP_MIN,
):
    """One fused multi-chip assembly step: sharded screening + sharded vote
    application with psum merge. This is the function dryrun_multichip jits
    over an n-device mesh (candidates and edit streams shard on dp; the
    reference-derived inputs replicate)."""

    def kernel(a_s, la_s, b_s, lb_s, ops_s, vals_s, start_s, fwd_s):
        scores = batch_score(
            a_s, la_s, b_s, lb_s, la_max=la_max, w_max=w_max, ratio=ratio
        )
        ok = scores.accept & (scores.matlen_a >= overlap_min)
        delta = device_elect(ops_s, vals_s, start_s, fwd_s, ok, L)
        merged = VoteDelta(
            jax.lax.psum(delta.sel, "dp"),
            jax.lax.psum(delta.sup, "dp"),
            jax.lax.psum(delta.total, "dp"),
        )
        n_accept = jax.lax.psum(ok.astype(jnp.int32).sum(), "dp")
        return scores, merged, n_accept

    fn = shard_map(
        kernel,
        mesh=mesh,
        in_specs=(
            P("dp", None), P("dp"), P("dp", None), P("dp"),
            P("dp", None), P("dp", None), P("dp"), P("dp"),
        ),
        out_specs=(
            BatchScores(P("dp"), P("dp"), P("dp"), P("dp"), P("dp"), P("dp")),
            VoteDelta(P(), P(), P()),
            P(),
        ),
    )
    return jax.jit(fn)(a, la, b, lb, ops, vals, start, forward)
