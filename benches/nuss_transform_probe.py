"""Probe: transform-domain (Nussbaumer / incomplete-NTT) external product
with the BK precomputed in the transform domain — VERDICT item 1.

Design under test (the judge's asymmetric accounting, made exact):
  * N = m*r with m = r = 32; block i of a poly is the stride slice x[i::32],
    an element of S = Z[Y]/(Y^32+1) (the generalization of the Karatsuba
    engine's residue layout).
  * Length-2r = 64 block-FFT over S with root omega = Y (order 64): every
    twiddle is a negacyclic rotation of a 32-vector, i.e. a SIGNED
    PERMUTATION, so the whole forward transform is one +-1 matrix
    M_f (N, 2N) and runs on the MXU as an int8 matmul.  Only the 2L = 6
    digit polys transform forward; only 2 output polys transform back
    (the TRGSWRepF asymmetry, reference trgsw.rs:64-108).
  * BK blocks are pre-transformed at keygen: G[j,c,k] in S mod 2^40
    (40 = 32 payload + 6 bits to absorb the 1/64 inverse-FFT scale + slack),
    stored per frequency k as an int8 limb panel P_k of shape
    (2L * 2 dlimbs * m, 2 * 5 blimbs * m): pointwise S-products become 64
    dense (B, 384) @ (384, 320) MXU matmuls.
  * Inverse: canonical 5-limb re-split of the pointwise partials (VPU carry
    chain), one +-1 matrix M_i (2N, N) per limb plane on the MXU, wraparound
    fold C_i + Y*C_{i+r}, and the EXACT division by 64 via
    c = (A >> 6) + (B << 10) + (Cp << 26) mod 2^32 where
    S = A + B*2^16 + Cp*2^32 = 64c mod 2^40 and 64 | A.

The probe (a) validates the complete limb pipeline bit-exactly against the
mod-2^32 oracle in numpy, and (b) times each MXU stage at B=8192 on the TPU
against the production Karatsuba-2 kernel's matmul stage, giving the
real numbers for ROADMAP.md's transform-domain assessment.

MAC accounting at default params (per gate per step, counted as int8 MACs):
  forward   6 * N * 2N          = 12.58M
  pointwise 64 * 384 * 320      =  7.86M
  inverse   2 * 5 * 2N * N      = 20.97M
  total                          = 41.4M   vs dense 48M, Karatsuba-2 28.3M

Usage: python benches/nuss_transform_probe.py [B]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

M = 32          # block size (S = Z[Y]/(Y^m+1))
R = 32          # blocks per poly
N = M * R       # 1024
F2 = 2 * R      # 64 frequencies
MOD_BITS = 40   # 32 payload + 6 scale + 2 slack
MOD = 1 << MOD_BITS
TWO_L = 6
HALF_BG = 32


# --------------------------------------------------------------------- #
# S = Z[Y]/(Y^m+1) primitives (numpy, exact)
# --------------------------------------------------------------------- #
def rot(v, e):
    """Y^e * v in S: (Y^e v)[u] = s * v[(u-e) mod m], s = -1 iff
    ((u - e) mod 2m) >= m.  v: (..., m) integer array (mod MOD)."""
    e = e % (2 * M)
    u = np.arange(M)
    src = (u - e) % M
    sign = np.where(((u - e) % (2 * M)) >= M, MOD - 1, 1).astype(np.uint64)
    return (v[..., src] * sign) % MOD


def blocks(x):
    """x (..., N) -> (..., R, m): block i = x[..., i::R]."""
    return np.moveaxis(
        x.reshape(x.shape[:-1] + (M, R)), -1, -2
    )


def unblocks(b):
    """inverse of blocks."""
    return np.moveaxis(b, -2, -1).reshape(b.shape[:-2] + (N,))


def forward_matrix():
    """M_f (N, 2N) int8 in {-1, 0, 1}: NATURAL-layout x (A_i[u] = x[i + u*R])
    -> 64 block-major frequency blocks F_k = sum_i Y^{ik} A_i (blocks
    zero-padded to 64): out[k*M + u] = F_k[u]."""
    Mf = np.zeros((N, 2 * N), np.int8)
    uu = np.arange(M)
    for i in range(R):
        for k in range(F2):
            e = (i * k) % (2 * M)
            src = (uu - e) % M
            sg = np.where(((uu - e) % (2 * M)) >= M, -1, 1)
            Mf[i + src * R, k * M + uu] += sg.astype(np.int8)
    return Mf


def inverse_matrix():
    """M_i (2N, N) int8: P (64 freq blocks) -> 64 C_t = sum_k Y^{-tk} P_k,
    THEN wraparound fold C_t + Y*C_{t+R} for t < R (folded into the same
    matrix), WITHOUT the 1/64 scale (handled by the final shift trick)."""
    Mi = np.zeros((2 * N, N), np.int64)
    uu = np.arange(M)
    for k in range(F2):
        for t in range(F2):
            e = (-t * k) % (2 * M)
            src = (uu - e) % M
            sg = np.where(((uu - e) % (2 * M)) >= M, -1, 1)
            if t < R:
                Mi[k * M + src, t + uu * R] += sg  # natural-layout output
            else:
                # wraparound: out block (t - R) += Y * C_t
                e2 = (e + 1) % (2 * M)
                src2 = (uu - e2) % M
                sg2 = np.where(((uu - e2) % (2 * M)) >= M, -1, 1)
                Mi[k * M + src2, (t - R) + uu * R] += sg2
    assert np.abs(Mi).max() <= 2, np.abs(Mi).max()  # entries may merge to +-2
    return Mi.astype(np.int8)


def bal_split(x, width, n_limbs):
    """Balanced signed limb split of x mod 2^(width*n_limbs) (numpy)."""
    out = []
    v = x.astype(np.int64).copy()
    for _ in range(n_limbs):
        l = v - (((v + (1 << (width - 1))) >> width) << width)
        out.append(l)
        v = (v - l) >> width
    return out


# --------------------------------------------------------------------- #
# Exact numpy pipeline
# --------------------------------------------------------------------- #
def prepare_bk(rows_u32):
    """rows (2L, 2, N) uint32 -> per-frequency panels P_k int8
    (64, 2L*2*m, 2*5*m): rows ordered (j, dlimb, u), cols (c, blimb, v)."""
    q = rows_u32.astype(np.uint64)
    G = np.zeros((TWO_L, 2, F2, M), np.uint64)
    for j in range(TWO_L):
        for c in range(2):
            Q = blocks(q[j, c])  # (R, m)
            for k in range(F2):
                acc = np.zeros(M, np.uint64)
                for i in range(R):
                    acc = (acc + rot(Q[i], i * k)) % MOD
                G[j, c, k] = acc
    panels = np.zeros((F2, TWO_L * 2 * M, 2 * 5 * M), np.int8)
    for k in range(F2):
        for j in range(TWO_L):
            for d in range(2):
                scaled = (G[j, :, k] << np.uint64(6 * d)) % MOD  # (2, m)
                for c in range(2):
                    for u in range(M):
                        gy = rot(scaled[c], u)  # Y^u * g — row u's column vec
                        gl = bal_split(gy.astype(np.int64) % MOD, 8, 5)
                        for e in range(5):
                            panels[k, (j * 2 + d) * M + u,
                                   (c * 5 + e) * M: (c * 5 + e + 1) * M] = gl[e]
    return panels


def nuss_external_product(digits, panels, Mf, Mi):
    """digits (B, 2L, N) int32 -> (B, 2, N) uint32, exact mod 2^32."""
    B = digits.shape[0]
    # Forward: 6 planes through the +-1 matrix (int64 here; int8xint8->int32
    # on the MXU: |F| <= 1024).
    F = digits.astype(np.int64) @ Mf.astype(np.int64)  # (B, 2L, 2N)
    f1 = (F + 32) >> 6
    f0 = F - (f1 << 6)
    assert np.abs(f0).max() < 64 and np.abs(f1).max() <= 17

    # Pointwise: per frequency k, (B, 2L*2*m) @ (2L*2*m, 2*5*m).
    parts = np.zeros((B, 2, 5, F2, M), np.int64)
    for k in range(F2):
        dk = np.empty((B, TWO_L * 2 * M), np.int64)
        for j in range(TWO_L):
            dk[:, (j * 2 + 0) * M: (j * 2 + 1) * M] = f0[:, j, k * M:(k + 1) * M]
            dk[:, (j * 2 + 1) * M: (j * 2 + 2) * M] = f1[:, j, k * M:(k + 1) * M]
        out = dk @ panels[k].astype(np.int64)  # (B, 2*5*m)
        assert np.abs(out).max() < 2 ** 31, np.abs(out).max()
        parts[:, :, :, k, :] = out.reshape(B, 2, 5, M)

    # Canonical re-limb (the VPU carry chain), then inverse matmuls.
    out_u32 = np.zeros((B, 2, N), np.uint32)
    for c in range(2):
        planes = [parts[:, c, e].reshape(B, 2 * N) for e in range(5)]
        limbs = []
        carry = np.zeros((B, 2 * N), np.int64)
        for e in range(5):
            t = planes[e] + carry
            l = t - (((t + 128) >> 8) << 8)
            limbs.append(l)
            carry = (t - l) >> 8
        # carry * 2^40 == 0 mod 2^40: dropped.
        assert max(np.abs(l).max() for l in limbs) <= 128
        W = [l @ Mi.astype(np.int64) for l in limbs]  # (B, N) each
        assert max(np.abs(w).max() for w in W) < 2 ** 31
        A = W[0] + (W[1] << 8)
        Bp = W[2] + (W[3] << 8)
        Cp = W[4]
        assert (A & 63).max() == 0, "divisibility by 64 must hold"
        c32 = ((A >> 6) + (Bp << 10) + (Cp << 26)) & 0xFFFFFFFF
        out_u32[:, c] = c32.astype(np.uint32)
    return out_u32


def main():
    B_exact = 4
    rs = np.random.RandomState(11)
    rows = rs.randint(0, 2 ** 32, size=(TWO_L, 2, N), dtype=np.uint64).astype(np.uint32)
    digits = rs.randint(-HALF_BG, HALF_BG, size=(B_exact, TWO_L, N)).astype(np.int32)

    print("building transform matrices + BK panels (numpy)...", flush=True)
    Mf = forward_matrix()
    Mi = inverse_matrix()
    panels = prepare_bk(rows)

    # Oracle: exact mod-2^32 external product.
    from rustfhe_tpu.poly import negacyclic_mul_i64

    want = np.zeros((B_exact, 2, N), np.uint32)
    for b in range(B_exact):
        for c in range(2):
            acc = np.zeros(N, np.int64)
            for j in range(TWO_L):
                acc += negacyclic_mul_i64(
                    rows[j, c].astype(np.int64), digits[b, j]
                )
            want[b, c] = (acc % (1 << 32)).astype(np.uint32)

    got = nuss_external_product(digits, panels, Mf, Mi)
    ok = np.array_equal(got, want)
    print(f"nussbaumer transform-domain EP exact vs oracle: {ok}", flush=True)
    if not ok:
        bad = np.argwhere(got != want)
        print(f"  mismatches: {len(bad)}, first: {bad[:5]}")
        return

    import os

    if os.environ.get("NUSS_EXACT_ONLY"):
        return

    # ------------------------------------------------------------------ #
    # TPU stage timings (int8 MXU): forward, pointwise, inverse — chained.
    # ------------------------------------------------------------------ #
    import jax
    import jax.numpy as jnp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    STEPS = 8
    print(f"# device: {jax.devices()[0]}  B={B}", flush=True)

    Mf_j = jnp.asarray(Mf)
    Mi_j = jnp.asarray(Mi)
    panels_j = jnp.asarray(panels)  # (64, 384, 320)
    d8 = jnp.asarray(rs.randint(-32, 32, size=(B, TWO_L, N)).astype(np.int8))
    l8 = jnp.asarray(rs.randint(-128, 128, size=(B, 2, 5, 2 * N)).astype(np.int8))
    dk8 = jnp.asarray(rs.randint(-32, 32, size=(F2, B, TWO_L * 2 * M)).astype(np.int8))

    @jax.jit
    def fwd(d):
        # (B, 6, N) @ (N, 2N) — batched as (6B, N)
        out = jnp.dot(d.reshape(-1, N), Mf_j, preferred_element_type=jnp.int32)
        return (out.astype(jnp.int8), )

    @jax.jit
    def pointwise(dk):
        # 64 x (B, 384) @ (384, 320) as one batched dot_general
        out = jax.lax.dot_general(
            dk, panels_j,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )  # (64, B, 320)
        return (out.astype(jnp.int8),)

    @jax.jit
    def inverse(l):
        out = jnp.dot(l.reshape(-1, 2 * N), Mi_j, preferred_element_type=jnp.int32)
        return (out.astype(jnp.int8),)

    def bench(name, fn, x, macs):
        # The relay caches identical executions: chain a data dependency by
        # mixing each output back into the next input.
        @jax.jit
        def step(acc):
            out = fn(acc)[0].reshape(-1)
            reps = -(-acc.size // out.size)
            mix = jnp.tile(out, reps)[: acc.size].reshape(acc.shape)
            return (acc + mix).astype(acc.dtype)

        jax.block_until_ready(step(x))
        t0 = time.perf_counter()
        acc = x
        for _ in range(STEPS):
            acc = step(acc)
        jax.block_until_ready(acc)
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:34s} {dt*1e3:8.3f} ms  ({macs*B/dt/1e12:6.1f} TMAC/s)",
              flush=True)
        return dt

    t_f = bench("forward 6x(B,1024)@(1024,2048)", fwd, d8, 6 * N * 2 * N)
    t_p = bench("pointwise 64x(B,384)@(384,320)", pointwise, dk8,
                F2 * 384 * 320)
    t_i = bench("inverse 10x(B,2048)@(2048,1024)", inverse, l8,
                10 * 2 * N * N)
    total = t_f + t_p + t_i
    print(f"\nMXU stages total: {total*1e3:.3f} ms/step (k2 kernel full step "
          f"measured 2.18-2.43 ms same day; k2 MXU floor 1.18 ms)", flush=True)
    print("see ROADMAP.md 'Transform-domain engine' for the assessment",
          flush=True)


if __name__ == "__main__":
    main()
