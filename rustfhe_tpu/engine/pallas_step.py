"""Pallas fused CMux-step / external-product kernels (TPU).

The blind-rotate hot path (reference trgsw.rs:264-330 + tfhe.rs:103-110)
as one kernel per step, everything in VMEM:

* Per scan step, XLA builds a margin-extended panel table
  W'[c][(j,l)*TM + r, u] = q[j,c,l][(u - (N-TM) - r) mod 2N]  (int8,
  ~11.3 MB instead of the 50 MB full circulant) via the log-doubling
  construction (build_panels_fast; jnp.tile costs ~0.5ms, doubling
  ~0.16ms, and XLA overlaps it with the previous step's kernel —
  precomputing all panels at keygen measured no faster and costs 7.2GB).
* The production kernel (_kernel_merged) computes BOTH output poly halves
  per batch tile: per-gate binary rotation, gadget decomposition, 2L*K
  groups of static-sliced int8 MXU dots (TB,TM)@(TM,N) accumulating
  exactly in int32, limb recombination with wrapping uint32 shifts, and
  the CMux accumulator add — no intermediate touches HBM.  The older
  c-split kernels (_kernel, _kernel_fused) are kept for external products
  outside the scan and for A/B probes.

Measured constraints (see BENCH.md / ROADMAP.md): in-kernel roll-built
panels and dynamic lane-dim slices of int8 fail to compile in Mosaic
(hence the "XLA builds panels / kernel slices statically" split); the
default 16MB scoped-VMEM stack limit must be raised (v5e has 128MB);
tb=128 beats larger batch tiles; K=1024-deep dots gain nothing over
TM=128 slices (Mosaic fuses the part+=dot chains into MXU accumulation).

Layout contract (PallasEngine.prepare_trgsw):
  digits: int8 (B, 2L*N); panels: int8 (2, 2L*K*TM, 2N-TM);
  out: uint32 (B, 2, N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I8 = jnp.int8
I32 = jnp.int32
U32 = jnp.uint32

TM = 128  # default contraction panel rows

# The XLA default "scoped vmem" stack limit is 16MB; the v5e has 128MB of
# physical VMEM.  Raising the cap lets one program hold both output-half
# panel tables (~11.3MB at N=1024) plus working buffers.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def build_panels(qd, params, tm: int = TM):
    """qd: int8 (2, R, 2N) -> W': int8 (2, R*TM, N - TM + N).

    W'[c, g*TM + r, u] = qd[c, g, (u - (N-TM) - r) mod 2N]: for output
    column n and contraction block mb, the kernel's operand panel is the
    STATIC slice W'[., g*TM:(g+1)*TM, (N-TM) - mb*TM + n].

    Built gather-free: tile(qq, TM) reshaped to rows of width 4N-1 shifts
    each row by -1 mod 2N (qq = [q, q] makes the 4N-period congruent to the
    2N-period), then one static column slice.
    """
    N = params.N
    two_n = 2 * N
    lead = qd.shape[:-1]  # (2, R)
    qq = jnp.concatenate([qd, qd], axis=-1)  # (2, R, 4N)
    t = jnp.tile(qq, (1,) * len(lead) + (tm,))  # (2, R, tm*4N)
    t = t[..., : tm * (2 * two_n - 1)].reshape(lead + (tm, 2 * two_n - 1))
    # t[c, g, r, i] = q[c, g, (i - r) mod 2N]; columns [2N - TM + ... pick
    # phase (N - TM): col u needs (u - (N-TM) - r) mod 2N = t col i with
    # i = u + (N - TM) + (2N - 2(N-TM))... i.e. i = u - (N-TM) mod 4N: use
    # i = u + N + TM (adds one 2N period to keep i >= 0 for all u, r).
    width = 2 * N - tm
    w = t[..., N + tm : N + tm + width]
    return w.reshape(lead[:-1] + (lead[-1] * tm, width))


def build_panels_doubling(qd, n: int, tm: int = TM):
    """Margin-extended panel table for polynomials of degree ``n``, built by
    log-doubling instead of tile.

    ``qd``: int8 (..., R, 2n) doubled negacyclic tables ->
    W': int8 (..., R*tm, 2n - tm) with
    W'[..., g*tm + r, u] = qd[..., g, (u - (n - tm) - r) mod 2n].

    ``jnp.tile``'s concatenate-of-tm-copies costs ~0.5 ms/step at tm=128 in
    the blind-rotate scan (measured, BENCH.md); the doubling construction
    moves ~2x the output bytes instead:

      S_0[g, 0, u] = qq[g, u];  S_{k+1} = concat([S_k, roll(S_k, 2^k)], rows)

    so S_log2(tm)[g, r, u] = qq[g, (u - r) mod 4n], and one static column
    slice yields the panel (qq = [qd, qd] makes the 4n roll congruent to the
    2n period).
    """
    assert tm & (tm - 1) == 0, "tm must be a power of two"
    lead = qd.shape[:-1]  # (..., R)
    qq = jnp.concatenate([qd, qd], axis=-1)  # (..., 4n)
    s = qq[..., None, :]  # (..., 1, 4n)
    k = 1
    while k < tm:
        s = jnp.concatenate([s, jnp.roll(s, k, axis=-1)], axis=-2)
        k *= 2
    # s[..., r, i] = qq[..., (i - r) mod 4n]; column u of W' needs index
    # (u - (n - tm) - r) mod 2n -> i = u + n + tm (one 2n period up).
    width = 2 * n - tm
    w = s[..., n + tm : n + tm + width]
    return w.reshape(lead[:-1] + (lead[-1] * tm, width))


def build_panels_fast(qd, params, tm: int = TM):
    """build_panels built by log-doubling (see build_panels_doubling)."""
    return build_panels_doubling(qd, params.N, tm)


def _kernel(w_hbm, d_ref, o_ref, w_vmem, sem, *, params, num_limbs, limb_bits, tb):
    c, b = pl.program_id(0), pl.program_id(1)
    N = params.N
    two_l = 2 * params.l

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm.at[c], w_vmem, sem)
        cp.start()
        cp.wait()

    acc = jnp.zeros((tb, N), U32)
    for j in range(two_l):
        for l in range(num_limbs):
            r0 = (j * num_limbs + l) * TM
            part = jnp.zeros((tb, N), I32)
            for mb in range(N // TM):
                d_blk = d_ref[:, j * N + mb * TM : j * N + (mb + 1) * TM]
                col0 = (N - TM) - mb * TM + 0
                w_blk = w_vmem[r0 : r0 + TM, col0 : col0 + N]
                part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            acc = acc + (part.astype(U32) << U32(limb_bits * l))
    o_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("params", "num_limbs", "limb_bits", "tb", "interpret")
)
def fused_external_product(digits_flat, panels, *, params, num_limbs=4, limb_bits=8,
                           tb=128, interpret=False):
    """digits_flat: int8 (B, 2L*N); panels: int8 (2, R*TM, 2N-TM) -> u32 (B, 2, N)."""
    B = digits_flat.shape[0]
    N = params.N
    two_l = 2 * params.l
    rows = two_l * num_limbs * TM
    width = 2 * N - TM
    assert B % tb == 0 and N % TM == 0
    assert panels.shape == (2, rows, width), panels.shape

    vma = jax.typeof(digits_flat).vma | jax.typeof(panels).vma
    grid = (2, B // tb)
    out = pl.pallas_call(
        functools.partial(
            _kernel, params=params, num_limbs=num_limbs, limb_bits=limb_bits, tb=tb
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * N), U32, vma=vma),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # panels stay in HBM; DMA'd
            pl.BlockSpec((tb, two_l * N), lambda c, b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, N), lambda c, b: (b, c)),
        scratch_shapes=[
            pltpu.VMEM((rows, width), I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * two_l * N * 2 * num_limbs * N,
            bytes_accessed=B * two_l * N + 2 * rows * width + B * 2 * N * 4,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels, digits_flat)
    return out.reshape(B, 2, N)


def _roll_neg_static(x, s: int, N: int):
    """x: (tb, N) u32 -> x * X^s for static s in [0, 2N): slice/concat/negate."""
    s = s % (2 * N)
    neg = s >= N
    if neg:
        s -= N
    negate = lambda v: (~v + U32(1)).astype(U32)
    if s == 0:
        out = x
    else:
        out = jnp.concatenate([negate(x[:, N - s :]), x[:, : N - s]], axis=1)
    return negate(out) if neg else out


def _rotate_binary_inkernel(x, n_col, N: int):
    """Per-row negacyclic rotation by n (in [0, 2N)): log2(2N) roll/select
    stages, the in-kernel form of poly.rotate_binary."""
    nbits = (2 * N - 1).bit_length()
    out = x
    for k in range(nbits):
        bit = ((n_col >> k) & 1) == 1  # (tb, 1)
        out = jnp.where(bit, _roll_neg_static(out, 1 << k, N), out)
    return out


def _kernel_fused(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params, num_limbs,
                  limb_bits, tb, tm):
    """Whole CMux step for output poly half c: rotate, diff, decompose,
    int8 dots, limb recombination, and acc + cross."""
    c, b = pl.program_id(0), pl.program_id(1)
    N = params.N
    lvls = params.l
    mask = U32(params.decomp_mask)
    half = U32(params.half_bg)
    digit_mask = U32(params.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm.at[c], w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]  # (tb, 1) int32
    accs = [acc_ref[:, p, :] for p in (0, 1)]  # u32 (tb, N) each
    us = []
    for p in (0, 1):
        rot = _rotate_binary_inkernel(accs[p], n_col, N)
        diff = (rot - accs[p]).astype(U32)
        us.append((diff + mask) ^ mask)

    acc_out = jnp.zeros((tb, N), U32)
    for j in range(2 * lvls):
        u = us[j // lvls]
        shift = U32(32 - params.bgbit * ((j % lvls) + 1))
        raw = (u >> shift) & digit_mask
        dig = (raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32).astype(I8)  # (tb, N)
        for l in range(num_limbs):
            r0 = (j * num_limbs + l) * tm
            part = jnp.zeros((tb, N), I32)
            for mb in range(N // tm):
                d_blk = dig[:, mb * tm : (mb + 1) * tm]
                col0 = (N - tm) - mb * tm
                w_blk = w_vmem[r0 : r0 + tm, col0 : col0 + N]
                part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            acc_out = acc_out + (part.astype(U32) << U32(limb_bits * l))
    old = jnp.where(c == 0, accs[0], accs[1])
    o_ref[:] = old + acc_out


@functools.partial(jax.jit, static_argnames=("params", "num_limbs", "limb_bits", "tb", "tm", "interpret"))
def fused_cmux_step(acc, a_tilde, panels, *, params, num_limbs=4, limb_bits=8,
                    tb=256, tm=TM, interpret=False):
    """One full blind-rotate step: acc (B, 2, N) u32, a_tilde (B,) int32 in
    [0, 2N), panels from build_panels -> new acc (B, 2, N) u32."""
    B = acc.shape[0]
    N = params.N
    rows = 2 * params.l * num_limbs * tm
    width = 2 * N - tm
    assert B % tb == 0

    vma = (jax.typeof(acc).vma | jax.typeof(a_tilde).vma
           | jax.typeof(panels).vma)
    grid = (2, B // tb)
    out = pl.pallas_call(
        functools.partial(
            _kernel_fused, params=params, num_limbs=num_limbs, limb_bits=limb_bits,
            tb=tb, tm=tm
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2 * N), U32, vma=vma),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, 2, N), lambda c, b: (b, 0, 0)),
            pl.BlockSpec((tb, 1), lambda c, b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, N), lambda c, b: (b, c)),
        scratch_shapes=[
            pltpu.VMEM((rows, width), I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * params.l * N * 2 * num_limbs * N,
            bytes_accessed=B * 2 * N * 4 * 2 + 2 * rows * width,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels, acc, a_tilde.astype(I32).reshape(B, 1))
    return out.reshape(B, 2, N)


def _kernel_merged(w_hbm, acc_ref, n_ref, o_ref, w_vmem, sem, *, params,
                   num_limbs, limb_bits, tb, tm):
    """Whole CMux step, BOTH output poly halves in one program: the
    rotation / decomposition / digit extraction runs once (the c-split
    kernel duplicates that VPU work per output half)."""
    b = pl.program_id(0)
    N = params.N
    lvls = params.l
    mask = U32(params.decomp_mask)
    half = U32(params.half_bg)
    digit_mask = U32(params.bg - 1)

    @pl.when(b == 0)
    def _():
        cp = pltpu.make_async_copy(w_hbm, w_vmem, sem)
        cp.start()
        cp.wait()

    n_col = n_ref[:, 0:1]  # (tb, 1) int32
    accs = [acc_ref[:, p, :] for p in (0, 1)]  # u32 (tb, N) each

    digs = []  # 2L int8 digit planes, shared by both output halves
    for p in (0, 1):
        rot = _rotate_binary_inkernel(accs[p], n_col, N)
        diff = (rot - accs[p]).astype(U32)
        u = (diff + mask) ^ mask
        for lv in range(lvls):
            shift = U32(32 - params.bgbit * (lv + 1))
            raw = (u >> shift) & digit_mask
            digs.append((raw + (raw & half) * U32(0xFFFFFFFE)).astype(I32).astype(I8))

    # Limb-outer accumulation: sum the 2L digit-plane convolutions in int32
    # FIRST (|sum| <= 2L*N*(Bg/2)*2^(limb_bits-1) ~= 2^24.6, exact), then do
    # ONE wrapping shift-add per (c, limb) — 8 full-width VPU recombine
    # passes per step instead of 48 (mod-2^32 shift-add distributes over the
    # int32->u32 cast).
    for c in (0, 1):
        acc_out = jnp.zeros((tb, N), U32)
        for l in range(num_limbs):
            part = jnp.zeros((tb, N), I32)
            for j in range(2 * lvls):
                dig = digs[j]
                r0 = (j * num_limbs + l) * tm
                for mb in range(N // tm):
                    d_blk = dig[:, mb * tm : (mb + 1) * tm]
                    col0 = (N - tm) - mb * tm
                    w_blk = w_vmem[c, r0 : r0 + tm, col0 : col0 + N]
                    part += jnp.dot(d_blk, w_blk, preferred_element_type=I32)
            acc_out = acc_out + (part.astype(U32) << U32(limb_bits * l))
        o_ref[:, c, :] = accs[c] + acc_out


@functools.partial(jax.jit, static_argnames=("params", "num_limbs", "limb_bits", "tb", "tm", "interpret"))
def fused_cmux_step_merged(acc, a_tilde, panels, *, params, num_limbs=4,
                           limb_bits=8, tb=256, tm=TM, interpret=False):
    """One full blind-rotate step with both output halves per program.

    acc (B, 2, N) u32, a_tilde (B,) int32 in [0, 2N), panels from
    build_panels -> new acc (B, 2, N) u32.  Needs the raised VMEM limit
    (both panel halves resident: 2 * 2L*K*tm * (2N-tm) int8)."""
    B = acc.shape[0]
    N = params.N
    rows = 2 * params.l * num_limbs * tm
    width = 2 * N - tm
    assert B % tb == 0

    vma = (jax.typeof(acc).vma | jax.typeof(a_tilde).vma
           | jax.typeof(panels).vma)
    return pl.pallas_call(
        functools.partial(
            _kernel_merged, params=params, num_limbs=num_limbs,
            limb_bits=limb_bits, tb=tb, tm=tm
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), U32, vma=vma),
        grid=(B // tb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((tb, 2, N), lambda b: (b, 0, 0)),
            pl.BlockSpec((tb, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((tb, 2, N), lambda b: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, rows, width), I8),
            pltpu.SemaphoreType.DMA(()),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * 2 * params.l * N * 2 * num_limbs * N,
            bytes_accessed=B * 2 * N * 4 * 2 + 2 * rows * width,
            transcendentals=0,
        ),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(panels, acc, a_tilde.astype(I32).reshape(B, 1))


class PallasEngine:
    """MatmulEngine-compatible engine with a fused Pallas external product.

    Key switch and torus-x-binary products reuse the XLA matmul paths.
    """

    def __init__(self, interpret: bool = False, tb: int = 128, fuse_step: bool = True,
                 tm: int = TM, merge_c: bool = True):
        from .matmul import MatmulEngine

        self._base = MatmulEngine(limb_bits=8, use_bf16=False)
        self.limb_bits = 8
        self.num_limbs = 4
        self.interpret = interpret
        self.tb = tb
        self.tm = tm
        self.fuse_step = fuse_step
        self.merge_c = merge_c
        self.name = "pallas"

    def cmux_step(self, prepared, acc, a_i, params):
        """Fully fused blind-rotate step: acc (..., 2, N) u32, a_i (...,)
        int32 in [0, 2N) -> CMux(bk, X^a * acc, acc).

        ``prepared`` is the doubled limb table from :meth:`prepare_trgsw`;
        the panel build (build_panels_fast) is overlapped by XLA with the
        previous step's kernel inside the scan."""
        lead = acc.shape[:-2]
        a2 = acc.reshape((-1, 2, params.N))
        n2 = a_i.reshape((-1,))
        pad = (-a2.shape[0]) % self.tb
        if pad:
            a2 = jnp.pad(a2, ((0, pad), (0, 0), (0, 0)))
            n2 = jnp.pad(n2, ((0, pad),))
        panels = build_panels_fast(prepared, params, self.tm)
        step_fn = fused_cmux_step_merged if self.merge_c else fused_cmux_step
        out = step_fn(
            a2, n2, panels, params=params, num_limbs=self.num_limbs,
            limb_bits=self.limb_bits, tb=self.tb, tm=self.tm,
            interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (2, params.N))

    def prepare_ksk(self, ksk_raw, params):
        return self._base.prepare_ksk(ksk_raw, params)

    def key_switch_digits(self, prepared, digits, params):
        return self._base.key_switch_digits(prepared, digits, params)

    def poly_mul_torus_binary(self, a, s, params):
        return self._base.poly_mul_torus_binary(a, s, params)

    def prepare_trgsw(self, rows, params):
        """(..., 2L, 2, N) u32 -> (..., 2, 2L*K, 2N) int8 (c-major doubled table).

        Panels are NOT precomputed here: building them per scan step with
        build_panels_fast is fully overlapped by XLA (measured equal to
        precomputed panels, 4,357 vs 4,360 gates/s) and avoids holding
        n * 11.3MB ~= 7.2GB of panel tables in HBM.
        """
        q = self._base.prepare_trgsw(rows, params)  # (..., 2L, 2, K, 2N)
        q = jnp.moveaxis(q, -3, -4)  # (..., 2, 2L, K, 2N)
        return q.reshape(q.shape[:-3] + (q.shape[-3] * q.shape[-2], q.shape[-1]))

    def external_product_digits(self, prepared, digits, params):
        lead = digits.shape[:-2]
        d = digits.astype(I8).reshape((-1, 2 * params.l * params.N))
        pad = (-d.shape[0]) % self.tb
        if pad:
            d = jnp.pad(d, ((0, pad), (0, 0)))
        panels = build_panels_fast(prepared, params)
        out = fused_external_product(
            d, panels, params=params, num_limbs=self.num_limbs,
            limb_bits=self.limb_bits, tb=self.tb, interpret=self.interpret,
        )
        if pad:
            out = out[: out.shape[0] - pad]
        return out.reshape(lead + (2, params.N))
