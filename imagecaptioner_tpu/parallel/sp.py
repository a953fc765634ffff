"""Sequence parallelism: shard the token axis of teacher activations.

The teacher's two long token axes — the ViT's 197 patch tokens and the
teacher-forced caption time axis — carry the transformer FLOPs.  Under a
``sequence_sharding`` policy, activations entering those stacks get a
``with_sharding_constraint`` placing the token axis on the mesh's 'model'
axis; GSPMD then propagates the layout and inserts the all-gathers the
(global) attention needs, while layernorms/MLPs stay fully sharded.

This is annotation-driven SP in the jax.sharding style (pick a mesh,
annotate, let XLA insert collectives): no manual collectives, and a no-op
when no policy is active (single-chip training/inference paths compile to
byte-identical programs).  ``tests/test_sharding.py`` proves logits equal
the replicated run on a virtual mesh; the driver's ``dryrun_multichip``
runs the full KD step under DP x TP x SP.

Usage:
    with sp.sequence_sharding(mesh, axis="model"):
        step = jax.jit(train_step)   # trace inside the policy

The policy is read at trace time, and jit caches are KEYED on it:
``sequence_sharding`` also enters ``jax.set_mesh(mesh)``, whose context mesh
is part of the jit cache key (verified: a function traced outside the
context re-traces on first call inside it, and each context keeps its own
cache entry).  A step jitted outside the policy therefore cannot silently
run unconstrained inside it, or vice versa.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_POLICY: Optional[Tuple[Mesh, str]] = None


@contextmanager
def sequence_sharding(mesh: Mesh, axis: str = "model"):
    """Activate sequence sharding for every teacher forward traced inside
    this context.  Entering ``jax.set_mesh`` keys every jit cache on the
    policy, so previously-traced steps re-trace here instead of reusing an
    unconstrained trace (and constrained traces don't leak back outside)."""
    global _POLICY
    prev = _POLICY
    _POLICY = (mesh, axis)
    try:
        with jax.set_mesh(mesh):
            yield
    finally:
        _POLICY = prev


def active() -> bool:
    return _POLICY is not None


def shard_seq(x: jax.Array, seq_axis: int) -> jax.Array:
    """Constrain ``x``'s ``seq_axis`` onto the policy's mesh axis (no-op
    without an active policy)."""
    if _POLICY is None:
        return x
    mesh, ax = _POLICY
    spec = [None] * x.ndim
    spec[seq_axis] = ax
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
