"""Pair-sharded descriptor matching over a device mesh.

The data-parallel axis of the SfM frontend: the candidate pair list is
sharded across chips with shard_map; descriptors are replicated (they are
small next to the O(F^2) distance work). Each chip runs the same batched
2-NN + ratio kernel on its pair shard — no cross-chip communication needed
until results are gathered.

This is the TPU equivalent of the reference's OMP-parallel pair loop
(ref: src/photogrammetrie/sfm/UnorderedFeatureMatchingStrategy.cpp:40) and
the sharding axis named in BASELINE.md ("matched pairs/s/chip at 1 chip /
1 host / >=2 hosts").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from sfm_mvs_pipeline_tpu.ops.matching import match_pair
from sfm_mvs_pipeline_tpu.parallel.mesh import DATA_AXIS, pad_to_multiple


@functools.lru_cache(maxsize=32)
def _sharded_matcher(
    mesh, ratio, distinct, backend, chunk, method, with_distance, exact
):
    """Build (once per parameter set) the jitted sharded matcher.

    Rebuilding the shard_map + jit wrapper per call retraces the whole
    program and round-trips the remote compile cache — measured ~1.5 s of
    overhead PER CALL on the real chip (bench_suite/shard_overhead.py);
    the lru cache makes repeat calls pay only dispatch."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if method == "flann" and backend == "pallas":
        method = "bf"  # exact kernel beats the shortlist on TPU
    fast = backend == "pallas" and method == "bf" and not exact

    out_specs = tuple([P(DATA_AXIS)] * (3 if with_distance else 2))

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS)),
        out_specs=out_specs,
        # pallas_call's out_shape carries no varying-mesh-axes annotation,
        # which the default check_vma=True rejects when the TPU kernel path
        # runs inside shard_map (found driving the 1-device-mesh overhead
        # bench on real hardware). Only the pallas paths (fast AND exact
        # both lower to pallas_call) need the opt-out; the jnp/flann paths
        # keep the validation (ADVICE r4)
        check_vma=not (backend == "pallas" and method == "bf"),
    )
    def go(descs, val, prs):
        if fast:
            # the single-device fused batched path runs per shard: one
            # Pallas dispatch for the whole pair shard (r5 fused kernel)
            from sfm_mvs_pipeline_tpu.ops.matching import (
                distinct_filter,
                ratio_test_mask,
            )
            from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import (
                two_nn_batch_fused,
            )

            bi, bs, ss = two_nn_batch_fused(descs, val, prs)
            vq = val[prs[:, 0]]
            mask = ratio_test_mask(bs, ss, vq, ratio)
            if distinct:
                mask = jax.vmap(distinct_filter)(bi, mask)
            if with_distance:
                return bi, mask, jnp.sqrt(jnp.maximum(bs, 0.0))
            return bi, mask

        def one(pair):
            return match_pair(
                descs[pair[0]], descs[pair[1]], val[pair[0]], val[pair[1]],
                ratio=ratio, distinct=distinct, backend=backend,
                method=method, with_distance=with_distance, exact=exact,
            )

        return jax.lax.map(one, prs, batch_size=chunk)

    return jax.jit(go)


def match_pairs_sharded(
    mesh,
    descriptors: np.ndarray,  # (S, F, D)
    valid: np.ndarray,  # (S, F)
    pairs: np.ndarray,  # (P, 2)
    ratio: float = 0.7,
    distinct: bool = False,
    backend: str = "auto",
    chunk: int = 8,
    method: str = "bf",
    with_distance: bool = False,
    exact: bool = False,
) -> tuple[np.ndarray, ...]:
    """Match pairs across the mesh. Returns (best_idx (P, F), mask (P, F))
    (+ best distance (P, F) when with_distance)."""
    n_dev = mesh.devices.size
    P_orig = len(pairs)
    pairs_p = pad_to_multiple(np.asarray(pairs, np.int32), n_dev)

    go = _sharded_matcher(
        mesh, ratio, distinct, backend, chunk, method, with_distance, exact
    )
    out = go(
        jnp.asarray(descriptors), jnp.asarray(valid), jnp.asarray(pairs_p)
    )
    return tuple(np.asarray(o)[:P_orig] for o in out)
