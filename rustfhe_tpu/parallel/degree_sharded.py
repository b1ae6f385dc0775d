"""Degree-axis (N-sharded) transform-domain external product.

SURVEY.md §5's "optional model-axis NTT with collectives between stages",
made concrete: the polynomial DEGREE axis spans the mesh's ``model``
devices, and the transform-domain pipeline (engine/transform.py) runs with
a reduce-scatter between each resharding stage:

  coefficients sharded on N          (each device: N/D columns)
    | local partial forward matmul   x_loc @ M_f[rows_loc, :]
    |-- psum_scatter over 2N  ------ frequencies sharded (2r/D per device)
    | digit-limb split + per-frequency pointwise matmuls + limb carry
    | chain: ALL LOCAL (the block-FFT is frequency-diagonal)
    | local partial inverse matmul   limbs_loc @ M_i[freq_rows_loc, :]
    |-- psum_scatter over N  ------- coefficients sharded on N again
    | exact /2r via the A/B/C shifts (elementwise, local)

The psum_scatter (reduce-scatter) pair is exactly the transposed-stage
collective family of a distributed FFT; results are BIT-EXACT vs the
unsharded engine (integer partial sums commute with the reduction —
tests/test_transform.py asserts equality on the virtual 8-device mesh).

This is a scaling DEMONSTRATION of the degree axis (useful when N-sharded
ciphertexts ever exceed HBM); the single-chip throughput path remains the
fused Karatsuba kernel + pure data parallelism (ROADMAP.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..engine.transform import (
    abc_combine,
    dlimb_split,
    forward_matrix,
    inverse_matrix,
    pointwise,
    relimb,
    split_mr,
)

I32 = jnp.int32
U32 = jnp.uint32


def degree_sharded_external_product_fn(mesh: Mesh, params, axis: str = "model"):
    """Build a jitted external product over digit polys N-sharded on
    ``axis``: fn(panels_sharded, digits) -> uint32 (..., 2, N) with the
    last axis sharded on ``axis``; digits int32 (..., 2L, N) sharded the
    same way (any number of leading batch axes; the shard_map is built per
    input rank on first use)."""
    N = params.N
    m, r = split_mr(N)
    D = mesh.shape[axis]
    assert (2 * r) % D == 0, (2 * r, D)
    assert N % D == 0
    sh = (2 * r).bit_length() - 1

    Mf = jnp.asarray(forward_matrix(N))   # (N, 2N)
    Mi = jnp.asarray(inverse_matrix(N))   # (2N, N)

    def local(panels_loc, digits_loc):
        # digits_loc: (..., 2L, N/D) — this device's coefficient columns.
        idx = jax.lax.axis_index(axis)
        rows = jax.lax.dynamic_slice_in_dim(Mf, idx * (N // D), N // D, axis=0)
        F_part = jnp.einsum(
            "...n,nk->...k", digits_loc.astype(I32), rows.astype(I32)
        )  # (..., 2L, 2N) partial sums
        # reduce-scatter: frequencies shard across the axis.
        F_loc = jax.lax.psum_scatter(
            F_part, axis, scatter_dimension=F_part.ndim - 1, tiled=True
        )  # (..., 2L, 2N/D)
        f0, f1 = dlimb_split(F_loc)
        parts = pointwise(f0, f1, panels_loc, m)   # (..., 2, BLIMBS, 2N/D)
        limbs = relimb(parts)                      # local carry chain
        mi_rows = jax.lax.dynamic_slice_in_dim(
            Mi, idx * (2 * N // D), 2 * N // D, axis=0
        )
        W_part = jnp.einsum(
            "...k,kn->...n", limbs.astype(I32), mi_rows.astype(I32)
        )  # (..., 2, BLIMBS, N) partial
        W_loc = jax.lax.psum_scatter(
            W_part, axis, scatter_dimension=W_part.ndim - 1, tiled=True
        )  # (..., 2, BLIMBS, N/D)
        return abc_combine(W_loc, sh)

    spec_panels = P(axis)  # (2r, rows, cols) sharded on frequencies
    fns = {}

    def call(panels_sharded, digits):
        nd = jnp.ndim(digits)
        if nd not in fns:
            spec_io = P(*((None,) * (nd - 1) + (axis,)))  # N-axis sharded
            fns[nd] = jax.jit(
                jax.shard_map(
                    local,
                    mesh=mesh,
                    in_specs=(spec_panels, spec_io),
                    out_specs=spec_io,
                )
            )
        return fns[nd](panels_sharded, digits)

    return call


def shard_transform_panels(panels, mesh: Mesh, axis: str = "model"):
    """Place per-frequency panels (2r, rows, cols) frequency-sharded."""
    from jax.sharding import NamedSharding

    return jax.device_put(jnp.asarray(panels), NamedSharding(mesh, P(axis)))
