"""Fused REPL evaluation: one device dispatch per bootstrap level.

The interactive cost model of the plain ``FheLogic`` path is dominated by
relay round trips, not compute: a single NAND through the console runs
eager leaf encodes, an eager pre-combination, the jitted bootstrap, an
eager decrypt and a host pull — each eager phase is a device RTT (~25 ms
through the remote tunnel; BENCH.md 2026-08-20).  The reference, a local
CPU library, pays none of that (30.6 ms total, ``tfhe.rs:297``).

This module removes every RTT except the unavoidable dispatch itself:

* an expression (``nander`` AST) lowers to a LEVEL PLAN over a fixed-size
  wire file — all plan arrays (gather indices, gate coefficient triples,
  leaf encodings) are computed on the HOST (numpy, zero device work);
* interior levels run as ONE jitted program (gather operands from the
  wire file + linear pre-combination + batched bootstrap + scatter back),
  identical for every expression — compiled once per session;
* the FINAL gate runs a second fused program that stops at the lv1
  sample extraction (no key switch — the result is decrypted, not fed to
  another gate) and performs the decrypt INSIDE the program, returning a
  single uint32 bit.

A depth-1 expression (the headline single NAND) is therefore exactly one
device dispatch; a depth-d expression is d dispatches.  Wire-file and
lane capacities are static (defaults cover interactive expressions; wider
circuits fall back to the generic evaluator path in ``nander``).

Reference anchor: ``nander/src/main.rs:56-63`` (parse/eval/decrypt loop);
the lowering mirrors ``apps/circuits.lower``.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .. import tlwe
from ..bootstrap import bootstrap, gate_bootstrapping_tlwe2tlwe
from ..engine import resolve_engine
from . import nander
from .circuits import Circuit, lower_folded, optimize

U32 = jnp.uint32
I32 = jnp.int32


def _count_leaves(e) -> int:
    match e:
        case nander.Leaf():
            return 1
        case nander.Not(lhs=l):
            return _count_leaves(l)
        case nander.Nand(lhs=l, rhs=r) | nander.And(lhs=l, rhs=r) | \
                nander.Or(lhs=l, rhs=r) | nander.Xor(lhs=l, rhs=r):
            return _count_leaves(l) + _count_leaves(r)
    raise TypeError(f"not an expression: {e!r}")


def exprs_to_circuit(exprs) -> tuple[Circuit, list[int]]:
    """nander ASTs -> (ONE Circuit with an input wire per DISTINCT leaf
    value and one output per expression, leaf bit values).  A shared
    circuit is what lets K pipelined expressions run as one fused session
    (FusedEvaluator.eval_bits).

    Leaves are deduplicated BY VALUE: two ``1`` literals are the same
    deterministic trivial encoding (FusedEvaluator.init_wires), so they
    may share one input wire — which in turn lets the optimizer pass
    (circuits.optimize) merge identical subexpressions ACROSS the K
    pipelined expressions into one bootstrap lane."""
    n_leaves = sum(_count_leaves(e) for e in exprs)
    n_in = min(max(n_leaves, 1), 2)  # <= 2 distinct leaf values exist
    c = Circuit(n_inputs=n_in)
    leaves: list[int] = []
    leaf_wire: dict[int, int] = {}

    def walk(e) -> int:
        match e:
            case nander.Leaf(value=v):
                b = int(bool(v))
                if b not in leaf_wire:
                    leaf_wire[b] = len(leaves)
                    leaves.append(b)
                return leaf_wire[b]
            case nander.Not(lhs=l):
                return c.not_(walk(l))
            case nander.Nand(lhs=l, rhs=r):
                return c.nand(walk(l), walk(r))
            case nander.And(lhs=l, rhs=r):
                return c.and_(walk(l), walk(r))
            case nander.Or(lhs=l, rhs=r):
                return c.or_(walk(l), walk(r))
            case nander.Xor(lhs=l, rhs=r):
                return c.xor(walk(l), walk(r))
        raise TypeError(f"not an expression: {e!r}")

    c.outputs = [walk(e) for e in exprs]
    # Pad so len(leaves) == n_inputs (evaluate_plain indexes every input
    # wire; a pad wire feeds no gate, so its value is irrelevant).
    leaves += [0] * (n_in - len(leaves))
    return c, leaves


def expr_to_circuit(expr) -> tuple[Circuit, list[int]]:
    """nander AST -> (Circuit with one input wire per DISTINCT leaf value
    — at most two, see exprs_to_circuit — and the leaf bit values, padded
    to n_inputs)."""
    return exprs_to_circuit([expr])


class FusedEvaluator:
    """Fused expression evaluator over a TFHE context: four programs,
    each compiled once per session (single-gate, first-level, interior
    level, final level) — a depth-d expression is d device dispatches.

    ``width``: gate lanes per interior level (padded; lanes beyond the
    level's gates bootstrap a zero pre-combination into a trash wire).
    ``max_wires``: wire-file size.  ``fits(expr)`` reports whether an
    expression's plan fits these static capacities."""

    def __init__(self, ctx, width: int = 8, max_wires: int = 64):
        self.ctx = ctx
        self.width = width
        self.max_wires = max_wires
        p = ctx.params
        mw = max_wires
        engine = resolve_engine(ctx.engine_name)
        mu = p.mu

        def init_wires(leaves, nonce):
            # leaves (MW,) uint32 in {0, 1, 2}: 0/1 = trivial leaf bit,
            # 2 = unused wire.  Built IN-PROGRAM so a dispatch uploads a
            # few hundred bytes, not a (MW, n+1) wire file — the relay
            # charges ~tens of ms for host->device array pushes.
            body = jnp.where(leaves == 1, U32(0x20000000),
                             jnp.where(leaves == 0, U32(0xE0000000), U32(0)))
            wires = jnp.zeros((mw, p.n + 1), U32).at[:, 0].set(body)
            # nonce (n,) lands in the trash wire's mask: result-neutral
            # cache busting for latency probes.
            return wires.at[mw - 1, 1:].set(nonce)

        def level_body(bk, ksk, wires, ia, ib, iout, coeffs):
            # wires (MW, n+1); ia/ib/iout (W,) int32; coeffs (W, 3) uint32
            from ..keys import CloudKey

            xa = wires[ia]
            xb = wires[ib]
            pre = (xa * coeffs[:, 0, None] + xb * coeffs[:, 1, None]).astype(U32)
            pre = pre.at[:, 0].add((coeffs[:, 2] * U32(mu)).astype(U32))
            out = bootstrap(pre, CloudKey(bk=bk, ksk=ksk), p, engine)
            return wires.at[iout].set(out)

        def final_body(bk, sk1, wires, iab, coeff):
            # iab (2,) int32; coeff (3,) uint32 -> decrypted bit (scalar)
            xa = wires[iab[0]]
            xb = wires[iab[1]]
            pre = (xa * coeff[0] + xb * coeff[1]).astype(U32)
            pre = pre.at[0].add((coeff[2] * U32(mu)).astype(U32))
            # No key switch: the output is decrypted at lv1 directly.
            lv1 = gate_bootstrapping_tlwe2tlwe(pre, bk, p, engine)
            return tlwe.decrypt_binary(lv1, sk1)

        def first_level_fn(bk, ksk, leaves, nonce, ia, ib, iout, coeffs):
            return level_body(bk, ksk, init_wires(leaves, nonce),
                              ia, ib, iout, coeffs)

        def single_gate_fn(bk, sk1, leaves, nonce, iab, coeff):
            return final_body(bk, sk1, init_wires(leaves, nonce), iab, coeff)

        def decrypt_many_fn(sk0, wires, roots):
            # roots (W,) int32 wire indices -> (W,) decrypted bits: the
            # pipelined session's ONE readback (pad lanes index the trash
            # wire; their garbage bits are dropped host-side).
            return tlwe.decrypt_binary(wires[roots], sk0)

        # Five programs, each compiled once per session: a depth-1
        # expression is exactly ONE dispatch of single_gate_fn with
        # byte-sized operands; deeper expressions run first_level once,
        # then level (wires stay device-resident between dispatches),
        # then final; pipelined K-expression sessions (eval_bits) end in
        # decrypt_many instead.
        self._first_level = jax.jit(first_level_fn)
        self._single_gate = jax.jit(single_gate_fn)
        self._level = jax.jit(level_body, donate_argnums=(2,))
        self._final = jax.jit(final_body)
        self._decrypt_many = jax.jit(decrypt_many_fn)

    # ------------------------------------------------------------------ #
    def _plan(self, expr):
        """Lower to per-level host-side plan arrays; None if it doesn't fit."""
        circ, leaf_bits = expr_to_circuit(expr)
        if not circ.gates:  # leaf-only expression: no device work at all
            return ("const", leaf_bits[circ.outputs[0]] if leaf_bits else 0)
        circ = optimize(circ)  # exact CSE+DCE: fewer lanes per level
        coeff, in_a, in_b, out_w, n_wires, out_src, out_neg = lower_folded(circ)
        root, root_neg = int(out_src[0]), bool(out_neg[0])
        if len(out_w) == 0:  # NOT chain over a leaf: still no device work
            return ("const", leaf_bits[root] ^ root_neg)
        # +1 trash wire for pad lanes.
        if n_wires + 1 > self.max_wires:
            return None
        level_of = {}
        for w in range(circ.n_inputs):
            level_of[w] = 0
        levels: dict[int, list[int]] = {}
        for g in range(len(out_w)):
            lv = 1 + max(level_of.get(in_a[g], 0), level_of.get(in_b[g], 0))
            level_of[out_w[g]] = lv
            levels.setdefault(lv, []).append(g)
        depth = max(levels)
        plans = []
        for lv in range(1, depth):
            gsel = levels[lv]
            if len(gsel) > self.width:
                return None
            pad = self.width - len(gsel)
            ia = np.array([in_a[g] for g in gsel] + [0] * pad, np.int32)
            ib = np.array([in_b[g] for g in gsel] + [0] * pad, np.int32)
            io = np.array([out_w[g] for g in gsel] + [self.max_wires - 1] * pad,
                          np.int32)
            cs = np.array(
                [coeff[g] for g in gsel] + [(0, 0, 0)] * pad,
                np.int64) & 0xFFFFFFFF
            plans.append((ia, ib, io, cs.astype(np.uint32)))
        # Final level: the root gate only (same-level non-root gates feed
        # nothing — dead code an expression can't produce; NOT folding
        # keeps the root gate at the deepest level since every emitted
        # gate is its ancestor).  A negated root flips the decrypted bit
        # host-side (free).
        root_gates = [g for g in levels[depth] if out_w[g] == root]
        assert len(root_gates) == 1, root_gates
        g = root_gates[0]
        fin = (np.array([in_a[g], in_b[g]], np.int32),
               (np.array(coeff[g], np.int64)
                & 0xFFFFFFFF).astype(np.uint32))
        return ("run", leaf_bits, circ.n_inputs, plans, fin, root_neg)

    def fits(self, expr) -> bool:
        return self._plan(expr) is not None

    # ---------------- pipelined multi-expression session --------------- #
    def _plan_many(self, exprs):
        """Lower K expressions into ONE shared wire file: per-level plan
        arrays over the combined DAG plus the K root wires; None if any
        level exceeds the lane width, the wire file overflows, or K
        exceeds the readback width.  The last lowering is memoized by the
        expression objects' identities, so the fits_many + eval_bits pair
        the console issues per chunk lowers once, not twice.  The memo
        HOLDS the expression objects (identity compare via ``is``), so a
        freed AST's recycled id can never alias a stale plan."""
        key = tuple(exprs)
        cached = getattr(self, "_plan_memo", None)
        if (cached is not None and len(cached[0]) == len(key)
                and all(a is b for a, b in zip(cached[0], key))):
            return cached[1]
        plan = self._plan_many_uncached(exprs)
        self._plan_memo = (key, plan)
        return plan

    def _plan_many_uncached(self, exprs):
        if len(exprs) > self.width:
            return None
        circ, leaf_bits = exprs_to_circuit(exprs)
        if not circ.gates:  # all leaf-only: no device work at all
            return ("const", [leaf_bits[r] for r in circ.outputs])
        circ = optimize(circ)  # merges shared subexpressions ACROSS the K
        coeff, in_a, in_b, out_w, n_wires, out_src, out_neg = lower_folded(circ)
        if len(out_w) == 0:  # every expression folded to a (±) leaf
            return ("const",
                    [leaf_bits[int(w)] ^ bool(n)
                     for w, n in zip(out_src, out_neg)])
        if n_wires + 1 > self.max_wires:
            return None
        level_of = {w: 0 for w in range(circ.n_inputs)}
        levels: dict[int, list[int]] = {}
        for g in range(len(out_w)):
            lv = 1 + max(level_of.get(in_a[g], 0), level_of.get(in_b[g], 0))
            level_of[out_w[g]] = lv
            levels.setdefault(lv, []).append(g)
        plans = []
        for lv in range(1, max(levels) + 1):  # ALL levels run interior
            gsel = levels.get(lv, [])
            if len(gsel) > self.width:
                return None
            pad = self.width - len(gsel)
            ia = np.array([in_a[g] for g in gsel] + [0] * pad, np.int32)
            ib = np.array([in_b[g] for g in gsel] + [0] * pad, np.int32)
            io = np.array(
                [out_w[g] for g in gsel] + [self.max_wires - 1] * pad,
                np.int32)
            cs = np.array(
                [coeff[g] for g in gsel] + [(0, 0, 0)] * pad,
                np.int64) & 0xFFFFFFFF
            plans.append((ia, ib, io, cs.astype(np.uint32)))
        # Roots may resolve to leaf wires (leaf-only expressions in the
        # mix) and may carry a free NOT: the decrypted bit flips host-side.
        return ("runK", leaf_bits, plans, out_src, out_neg)

    def fits_many(self, exprs) -> bool:
        return self._plan_many(exprs) is not None

    def eval_bits(self, exprs, _nonce=None) -> list[int]:
        """Pipelined session (VERDICT r4 #6): K expressions -> K bits with
        depth(combined DAG) level dispatches and ONE readback, so the
        ~25 ms relay readback RTT and the per-dispatch cost amortize over
        K.  K single-gate expressions cost one level dispatch + one
        decrypt dispatch + one readback — sustained ms/expression is the
        whole point (BENCH.md round-5 measures it < the reference's
        30.6 ms console answer)."""
        plan = self._plan_many(exprs)
        if plan is None:
            raise ValueError("expression batch exceeds the fused "
                             "evaluator's static capacities")
        if plan[0] == "const":
            return [int(b) for b in plan[1]]
        _, leaf_bits, plans, roots, roots_neg = plan
        p = self.ctx.params
        leaves = np.full(self.max_wires, 2, np.uint32)
        leaves[: len(leaf_bits)] = np.asarray(leaf_bits, np.uint32)
        nonce = (np.zeros(p.n, np.uint32) if _nonce is None
                 else np.asarray(_nonce, np.uint32))
        ck = self.ctx.ck
        ia, ib, io, cs = plans[0]
        wires = self._first_level(ck.bk, ck.ksk, leaves, nonce, ia, ib, io,
                                  cs)
        for ia, ib, io, cs in plans[1:]:
            wires = self._level(ck.bk, ck.ksk, wires, ia, ib, io, cs)
        rootv = np.full(self.width, self.max_wires - 1, np.int32)
        rootv[: len(roots)] = np.asarray(roots, np.int32)
        bits = self._decrypt_many(self.ctx.sk.lv0, wires, rootv)
        arr = np.asarray(jax.block_until_ready(bits))
        return [int(arr[i]) ^ bool(roots_neg[i]) for i in range(len(roots))]

    def eval_bit(self, expr, _nonce=None) -> int:
        """Evaluate to a decrypted bit: depth device dispatches total.

        ``_nonce``: optional uint32 (n,) written into the trash wire's mask
        — result-neutral (the trash wire feeds nothing), used by latency
        probes to defeat the relay's identical-execution cache."""
        plan = self._plan(expr)
        if plan is None:
            raise ValueError("expression exceeds the fused evaluator's "
                             "static capacities")
        if plan[0] == "const":
            return int(plan[1])
        _, leaf_bits, n_inputs, plans, (iab, coeff), root_neg = plan
        p = self.ctx.params
        # Leaf encodings travel as a (MW,) byte vector; the wire file is
        # built in-program (see init_wires) so no large host->device push
        # happens on the latency path.
        leaves = np.full(self.max_wires, 2, np.uint32)
        leaves[: len(leaf_bits)] = np.asarray(leaf_bits, np.uint32)
        nonce = (np.zeros(p.n, np.uint32) if _nonce is None
                 else np.asarray(_nonce, np.uint32))
        ck = self.ctx.ck
        if not plans:  # depth-1: one dispatch, byte-sized operands
            bit = self._single_gate(ck.bk, self.ctx.sk.lv1, leaves, nonce,
                                    iab, coeff)
            return int(jax.block_until_ready(bit)) ^ root_neg
        ia, ib, io, cs = plans[0]
        wires = self._first_level(ck.bk, ck.ksk, leaves, nonce, ia, ib, io, cs)
        for ia, ib, io, cs in plans[1:]:
            wires = self._level(ck.bk, ck.ksk, wires, ia, ib, io, cs)
        bit = self._final(ck.bk, self.ctx.sk.lv1, wires, iab, coeff)
        return int(jax.block_until_ready(bit)) ^ root_neg
