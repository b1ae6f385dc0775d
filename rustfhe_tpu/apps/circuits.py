"""Boolean circuits over encrypted bits, evaluated level-by-level in batches.

This is new TPU-first capability beyond the reference (which evaluates one
gate at a time, ``nander/src/lib.rs:72-89``): a circuit is levelized into
topological layers, and within each layer all gates of the same type run as
ONE batched bootstrapping call — the batch axis is where TPU throughput
comes from (SURVEY.md §7).

Includes the 8-bit ripple-carry adder depth test from BASELINE.json's
bench configs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

# gate ops: 2-input ops plus NOT and MUX
_OPS2 = ("nand", "and", "or", "xor")


@dataclass
class Gate:
    op: str  # nand|and|or|xor|not|mux
    inputs: tuple[int, ...]
    output: int


@dataclass
class Circuit:
    """Wire-indexed gate list.  Wires [0, n_inputs) are primary inputs."""

    n_inputs: int
    gates: list[Gate] = field(default_factory=list)
    outputs: list[int] = field(default_factory=list)
    _next: int = None  # type: ignore

    def __post_init__(self):
        if self._next is None:
            self._next = self.n_inputs

    def _new_wire(self) -> int:
        w = self._next
        self._next += 1
        return w

    def add(self, op: str, *inputs: int) -> int:
        out = self._new_wire()
        self.gates.append(Gate(op, tuple(inputs), out))
        return out

    def nand(self, a, b):
        return self.add("nand", a, b)

    def and_(self, a, b):
        return self.add("and", a, b)

    def or_(self, a, b):
        return self.add("or", a, b)

    def xor(self, a, b):
        return self.add("xor", a, b)

    def not_(self, a):
        return self.add("not", a)

    def mux(self, control, in0, in1):
        return self.add("mux", control, in0, in1)

    @property
    def n_wires(self) -> int:
        return self._next

    def levelize(self) -> list[list[Gate]]:
        """Topological layers: a gate's level = 1 + max(level of inputs)."""
        level = {w: 0 for w in range(self.n_inputs)}
        layers: dict[int, list[Gate]] = {}
        for g in self.gates:
            lv = 1 + max((level.get(w, 0) for w in g.inputs), default=0)
            level[g.output] = lv
            layers.setdefault(lv, []).append(g)
        return [layers[k] for k in sorted(layers)]

    @property
    def depth(self) -> int:
        return len(self.levelize())


def evaluate_plain(circuit: Circuit, inputs: np.ndarray) -> np.ndarray:
    """Plaintext evaluation; inputs (..., n_inputs) -> (..., n_outputs)."""
    inputs = np.asarray(inputs)
    wires = {w: inputs[..., w] for w in range(circuit.n_inputs)}
    for g in circuit.gates:
        a = [wires[w] for w in g.inputs]
        if g.op == "nand":
            wires[g.output] = 1 - (a[0] & a[1])
        elif g.op == "and":
            wires[g.output] = a[0] & a[1]
        elif g.op == "or":
            wires[g.output] = a[0] | a[1]
        elif g.op == "xor":
            wires[g.output] = a[0] ^ a[1]
        elif g.op == "not":
            wires[g.output] = 1 - a[0]
        elif g.op == "mux":
            wires[g.output] = np.where(a[0] != 0, a[2], a[1])
        else:
            raise ValueError(g.op)
    return np.stack([wires[w] for w in circuit.outputs], axis=-1)


def _bucket(k: int) -> int:
    """Round a per-level gate count up to a power of two so the jitted gate
    programs are reused across levels instead of recompiling per width."""
    return 1 << (k - 1).bit_length() if k > 1 else 1


def evaluate_encrypted(circuit: Circuit, ctx, ct_inputs) -> jnp.ndarray:
    """Levelized batched FHE evaluation.

    ``ct_inputs``: TLWE batch of shape (n_inputs, n+1) (or (..., n_inputs,
    n+1) with extra leading batch axes — every gate then evaluates the whole
    leading batch too).  Within each level, all gates of one type are
    evaluated in a single batched bootstrapping call, padded to power-of-two
    widths so XLA compiles one program per (op, width-bucket).
    """
    wires: dict[int, jnp.ndarray] = {
        w: ct_inputs[..., w, :] for w in range(circuit.n_inputs)
    }

    def stacked(ws):
        cts = [wires[w] for w in ws]
        k = len(cts)
        pad = _bucket(k) - k
        cts = cts + [cts[0]] * pad  # padding lanes are dummies, ignored below
        return jnp.stack(cts, axis=-2)

    for layer in circuit.levelize():
        by_op: dict[str, list[Gate]] = {}
        for g in layer:
            by_op.setdefault(g.op, []).append(g)
        for op, gs in by_op.items():
            if op in _OPS2:
                xs = stacked([g.inputs[0] for g in gs])
                ys = stacked([g.inputs[1] for g in gs])
                method = {"nand": ctx.nand, "and": ctx.and_, "or": ctx.or_, "xor": ctx.xor}[op]
                outs = method(xs, ys)
            elif op == "not":
                outs = ctx.not_(stacked([g.inputs[0] for g in gs]))
            elif op == "mux":
                outs = ctx.mux(
                    stacked([g.inputs[0] for g in gs]),
                    stacked([g.inputs[1] for g in gs]),
                    stacked([g.inputs[2] for g in gs]),
                )
            else:
                raise ValueError(op)
            for j, g in enumerate(gs):
                wires[g.output] = outs[..., j, :]
    return jnp.stack([wires[w] for w in circuit.outputs], axis=-2)


def ripple_carry_adder(n_bits: int) -> Circuit:
    """n-bit ripple-carry adder: inputs a[0..n), b[0..n) (LSB first);
    outputs sum[0..n) then carry-out.  Full adder per bit:
    s = a^b^cin, cout = (a&b) | (cin & (a^b))."""
    c = Circuit(n_inputs=2 * n_bits)
    carry = None
    sums = []
    for i in range(n_bits):
        a, b = i, n_bits + i
        axb = c.xor(a, b)
        if carry is None:
            sums.append(axb)
            carry = c.and_(a, b)
        else:
            sums.append(c.xor(axb, carry))
            t1 = c.and_(a, b)
            t2 = c.and_(carry, axb)
            carry = c.or_(t1, t2)
    c.outputs = sums + [carry]
    return c
