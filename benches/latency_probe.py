"""Probe: small-batch gate LATENCY (vs the throughput-optimized default).

The framework is throughput-first (B=131072 -> 16.9 s/batch, 7.7k gates/s);
this measures the other end: wall-clock for one bootstrap batch at small B,
i.e. the latency a circuit level of a few gates pays.  The reference's
single-gate latency is 30.6 ms (one core, BASELINE.md); here a whole batch
shares the 635-step scan, so per-BATCH latency is the honest number and
per-gate latency divides by B.

Also measures LATENCY MODE (keys.cloud_key_panels): all 635 per-step
kernel panel tables precomputed into ~13.5 GB of HBM, removing the
per-step XLA panel build that dominates small-batch steps.

Usage: python benches/latency_probe.py   (TPU)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from rustfhe_tpu import gates, keys, tlwe  # noqa: E402
from rustfhe_tpu.engine import select_fast_engine  # noqa: E402
from rustfhe_tpu.params import DEFAULT_PARAMS as P  # noqa: E402

U32 = jnp.uint32


def main():
    print(f"# device: {jax.devices()[0]}", flush=True)
    engine_name = select_fast_engine(P)
    print(f"# engine: {engine_name}", flush=True)
    key = jax.random.PRNGKey(0)
    kg, ke = jax.random.split(key)
    sk, ck = keys.gen_keys(kg, P, engine_name=engine_name)
    jax.block_until_ready(ck)
    t0 = time.perf_counter()
    ck_lat = keys.cloud_key_panels(ck, P, engine_name)
    jax.block_until_ready(ck_lat)
    lat_available = ck_lat.bk.shape != ck.bk.shape
    print(
        f"# latency-mode panels: {'built' if lat_available else 'n/a'} "
        f"in {time.perf_counter() - t0:.1f}s "
        f"({ck_lat.bk.size / 2**30:.1f} GiB)",
        flush=True,
    )

    # 16384 = the measured latency-mode batch cap; 32768 documents the OOM
    # boundary (reported, not fatal).
    for B in (128, 1024, 8192, 16384, 32768):
        rs = np.random.RandomState(B)
        bx = rs.randint(0, 2, size=B).astype(np.uint32)
        by = rs.randint(0, 2, size=B).astype(np.uint32)
        cx = tlwe.encrypt_binary(jax.random.fold_in(ke, B), sk.lv0, jnp.asarray(bx), P)
        cy = tlwe.encrypt_binary(jax.random.fold_in(ke, B + 1), sk.lv0, jnp.asarray(by), P)
        pre = jax.block_until_ready(gates.precombine("nand", cx, cy, params=P))

        out = jax.block_until_ready(
            gates.hom_bootstrap(ck, pre, params=P, engine_name=engine_name)
        )  # compile
        dec = np.asarray(tlwe.decrypt_binary(out, sk.lv0))
        bad = int((dec != (1 - (bx & by))).sum())
        assert bad == 0, f"B={B}: {bad} wrong"

        for tag, ck_use in (("build/step", ck), ("latency-mode", ck_lat)):
            if tag == "latency-mode" and not lat_available:
                continue
            try:
                out2 = jax.block_until_ready(
                    gates.hom_bootstrap(ck_use, pre, params=P, engine_name=engine_name)
                )  # compile this key form
            except Exception as e:
                print(
                    f"B={B:6d} [{tag:12s}]: FAILED "
                    f"({type(e).__name__}: {str(e)[:80]})",
                    flush=True,
                )
                continue
            if tag == "latency-mode":
                assert np.array_equal(np.asarray(out2), np.asarray(out)), (
                    "latency-mode output differs"
                )
            times = []
            x = pre
            for _ in range(5):  # chained (x changes) to defeat relay caching
                x = (x + U32(1)).astype(U32)
                t0 = time.perf_counter()
                jax.block_until_ready(
                    gates.hom_bootstrap(ck_use, x, params=P, engine_name=engine_name)
                )
                times.append(time.perf_counter() - t0)
            best = min(times)
            print(
                f"B={B:6d} [{tag:12s}]: {best*1e3:8.1f} ms/batch  "
                f"({best/B*1e3:7.3f} ms/gate amortized, {B/best:,.0f} gates/s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
