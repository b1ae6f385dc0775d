"""Key and ciphertext (de)serialization.

Deliberate new capability over the reference, which has none (SURVEY.md §5:
no serde, keys live only in process memory): secret keys, raw evaluation
keys and ciphertext batches round-trip through ``.npz`` files, enabling
cloud/client key separation and cross-implementation test vectors.

Raw (uint32) key material is stored, not engine-prepared forms, so files
are engine- and limb-layout-independent; the engine preparation is
recomputed on load.
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..engine import get_engine
from ..keys import CloudKey, SecretKey
from ..params import TFHEParams

_PARAM_FIELDS = ("n", "N", "alpha_lv0", "alpha_lv1", "bgbit", "l", "iks_basebit", "iks_l")

MAGIC = "rustfhe_tpu"
VERSION = 1


def _params_header(params: TFHEParams) -> np.ndarray:
    meta = {"magic": MAGIC, "version": VERSION,
            "params": {f: getattr(params, f) for f in _PARAM_FIELDS}}
    return np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)


def _parse_header(arr: np.ndarray) -> TFHEParams:
    meta = json.loads(bytes(arr.tobytes()).decode())
    if meta.get("magic") != MAGIC:
        raise ValueError("not a rustfhe_tpu file")
    if meta.get("version") != VERSION:
        raise ValueError(f"unsupported version {meta.get('version')}")
    return TFHEParams(**meta["params"])


def save_secret_key(path: str, sk: SecretKey, params: TFHEParams) -> None:
    np.savez_compressed(
        path,
        header=_params_header(params),
        lv0=np.asarray(sk.lv0, np.uint32),
        lv1=np.asarray(sk.lv1, np.uint32),
    )


def load_secret_key(path: str) -> tuple[SecretKey, TFHEParams]:
    with np.load(path) as z:
        params = _parse_header(z["header"])
        sk = SecretKey(lv0=jnp.asarray(z["lv0"]), lv1=jnp.asarray(z["lv1"]))
    return sk, params


def save_cloud_key_raw(path: str, bk_raw, ksk_raw, params: TFHEParams) -> None:
    """Store raw uint32 evaluation keys (engine-independent)."""
    np.savez_compressed(
        path,
        header=_params_header(params),
        bk=np.asarray(bk_raw, np.uint32),
        ksk=np.asarray(ksk_raw, np.uint32),
    )


def load_cloud_key(path: str, engine_name: str = "matmul") -> tuple[CloudKey, TFHEParams]:
    """Load raw evaluation keys and prepare them for ``engine_name``."""
    engine = get_engine(engine_name)
    with np.load(path) as z:
        params = _parse_header(z["header"])
        bk = engine.prepare_trgsw(jnp.asarray(z["bk"]), params)
        ksk = engine.prepare_ksk(jnp.asarray(z["ksk"]), params)
    return CloudKey(bk=bk, ksk=ksk), params


def save_ciphertexts(path: str, cts, params: TFHEParams) -> None:
    np.savez_compressed(path, header=_params_header(params), cts=np.asarray(cts, np.uint32))


def load_ciphertexts(path: str) -> tuple[jnp.ndarray, TFHEParams]:
    with np.load(path) as z:
        params = _parse_header(z["header"])
        cts = jnp.asarray(z["cts"])
    return cts, params
