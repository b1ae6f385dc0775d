"""Throughput benchmark: batched bootstrapped HomNAND gates/s on one chip.

Baseline: the reference's single-core HomNAND bootstrap at the same
parameter set — 30,558,481 ns/gate ~= 32.72 gates/s
(``/root/reference/hom_nand/src/tfhe.rs:297``, BASELINE.md).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "gates/s", "vs_baseline": N/32.72}

Correctness is asserted before timing: the benched batch's NAND outputs are
decrypted and checked against the truth table, so a fast-but-wrong engine
cannot score.
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32

BASELINE_GATES_PER_SEC = 1e9 / 30_558_481.0  # 32.72


def main():
    from rustfhe_tpu import gates, keys, tlwe
    from rustfhe_tpu.engine import select_fast_engine
    from rustfhe_tpu.params import DEFAULT_PARAMS, FAST_PARAMS, N2048_PARAMS

    p = {"default": DEFAULT_PARAMS, "n2048": N2048_PARAMS, "fast": FAST_PARAMS}[
        os.environ.get("BENCH_PARAMS", "default")
    ]
    batch = int(os.environ.get("BENCH_BATCH", "8192"))
    iters = int(os.environ.get("BENCH_ITERS", "3"))

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    engine_name = select_fast_engine(p)
    print(f"# engine: {engine_name}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    kg, ke = jax.random.split(key)
    t0 = time.perf_counter()
    sk, ck = keys.gen_keys(kg, p, engine_name=engine_name)
    jax.block_until_ready(ck)
    print(f"# keygen: {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    # Batch of encrypted inputs cycling through the 4 truth-table rows.
    pat = np.tile(np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.uint32), (batch // 4 + 1, 1))[
        :batch
    ]
    bx = jnp.asarray(pat[:, 0])
    by = jnp.asarray(pat[:, 1])
    k1, k2 = jax.random.split(ke)
    cx = tlwe.encrypt_binary(k1, sk.lv0, bx, p)
    cy = tlwe.encrypt_binary(k2, sk.lv0, by, p)

    def run():
        return gates.hom_nand(ck, cx, cy, params=p, engine_name=engine_name)

    # Warmup / compile + correctness gate.
    t0 = time.perf_counter()
    out = jax.block_until_ready(run())
    print(f"# compile+first run: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    dec = np.asarray(tlwe.decrypt_binary(out, sk.lv0))
    expect = 1 - (pat[:, 0] & pat[:, 1])
    n_bad = int((dec != expect).sum())
    assert n_bad == 0, f"correctness failure: {n_bad}/{batch} wrong NAND outputs"
    print(f"# correctness: {batch}/{batch} NAND outputs decode correctly", file=sys.stderr)

    # Timed runs.
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        times.append(time.perf_counter() - t0)
    best = min(times)
    gps = batch / best
    print(f"# per-batch: {best * 1e3:.1f} ms ({batch} gates) -> {gps:,.0f} gates/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "homnand_bootstraps_per_sec_single_chip",
                "value": round(gps, 1),
                "unit": "gates/s",
                "vs_baseline": round(gps / BASELINE_GATES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
