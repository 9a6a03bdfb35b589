"""Key / ciphertext (de)serialization.

The reference has **no** serialization at all (SURVEY.md §5 "Checkpoint /
resume: None — keys and ciphertexts have no serialization API"); its docs
imply persistent-key workflows, so this module supplies the missing
capability.  Format: a single ``.npz`` container (versioned) holding the
residue tensors plus a JSON header with static metadata — portable across
hosts and backends, no pickling of code objects.

Every public type round-trips::

    save(path, {"pk": pk, "sk": sk, "ct": ct})
    objs = load(path)          # objs["ct"] is a Ciphertext again
"""

from __future__ import annotations

import json
import typing as _t

import numpy as np
import jax.numpy as jnp

from ..params import SchemeParams, SecurityParams
from ..scheme.types import (Ciphertext, GaloisKeys, Plaintext, PublicKey,
                            RelinKeys, SecretKey)

FORMAT_VERSION = 1

# type tag -> (class, static metadata fields)
_TYPES: dict[str, tuple[type, tuple[str, ...]]] = {
    "Plaintext": (Plaintext, ("is_ntt_form",)),
    "Ciphertext": (Ciphertext, ("level", "is_ntt_form", "noise_budget",
                                "scale_t")),
    "PublicKey": (PublicKey, ()),
    "SecretKey": (SecretKey, ()),
    "RelinKeys": (RelinKeys, ()),
    "GaloisKeys": (GaloisKeys, ()),
}
# BootstrapKey (scheme/bootstrap.py) is special-cased by name in
# _flatten/_unflatten: it holds pos/neg tensors instead of .data, and the
# import is lazy to avoid a utils <-> scheme cycle.
_CLS_TO_TAG = {cls: tag for tag, (cls, _) in _TYPES.items()}


def _params_to_meta(params: SchemeParams) -> dict:
    return {
        "type": "SchemeParams",
        "security": dataclasses_asdict(params.security),
        "q_primes": list(params.q_primes),
        "aux_primes": list(params.aux_primes),
        "m_sk": params.m_sk, "gamma": params.gamma,
        "m_tilde": params.m_tilde, "n": params.n, "t": params.t,
    }


def dataclasses_asdict(obj):
    import dataclasses
    return dataclasses.asdict(obj)


def _params_from_meta(meta: dict) -> SchemeParams:
    return SchemeParams(
        security=SecurityParams(**meta["security"]),
        n=meta["n"], t=meta["t"],
        q_primes=tuple(meta["q_primes"]),
        aux_primes=tuple(meta["aux_primes"]),
        m_sk=meta["m_sk"], gamma=meta["gamma"], m_tilde=meta["m_tilde"],
    )


def _flatten(name: str, obj) -> tuple[dict[str, np.ndarray], dict]:
    if isinstance(obj, SchemeParams):
        return {}, _params_to_meta(obj)
    if type(obj).__name__ == "BootstrapKey":
        return (
            {f"{name}/pos": np.asarray(obj.pos),
             f"{name}/neg": np.asarray(obj.neg)},
            {"type": "BootstrapKey", "meta": {"level": int(obj.level)}},
        )
    tag = _CLS_TO_TAG.get(type(obj))
    if tag is None:
        raise TypeError(f"cannot serialize {type(obj).__name__!r}")
    _, meta_fields = _TYPES[tag]

    def _jsonable(v):
        # scale_t may be a concrete device scalar (it is a traced pytree
        # leaf inside jit); store it as a plain int
        if isinstance(v, np.integer):
            return int(v)
        if hasattr(v, "shape") and getattr(v, "shape", None) == ():
            return v.item()
        return v

    meta: dict = {"type": tag,
                  "meta": {f: _jsonable(getattr(obj, f)) for f in meta_fields}}
    arrays: dict[str, np.ndarray] = {}
    if tag == "GaloisKeys":
        meta["elements"] = sorted(int(g) for g in obj.data)
        for g in meta["elements"]:
            arrays[f"{name}/g{g}"] = np.asarray(obj.data[g])
    else:
        arrays[f"{name}/data"] = np.asarray(obj.data)
    return arrays, meta


def _unflatten(name: str, meta: dict, npz) -> _t.Any:
    if meta["type"] == "SchemeParams":
        return _params_from_meta(meta)
    if meta["type"] == "BootstrapKey":
        from ..scheme.bootstrap import BootstrapKey
        return BootstrapKey(pos=jnp.asarray(npz[f"{name}/pos"]),
                            neg=jnp.asarray(npz[f"{name}/neg"]),
                            level=meta["meta"]["level"])
    cls, _ = _TYPES[meta["type"]]
    if meta["type"] == "GaloisKeys":
        data = {int(g): jnp.asarray(npz[f"{name}/g{g}"])
                for g in meta["elements"]}
        return cls(data=data)
    return cls(data=jnp.asarray(npz[f"{name}/data"]), **meta.get("meta", {}))


def save(path, objs: dict[str, _t.Any]) -> None:
    """Write a named collection of FHE objects to ``path`` (.npz)."""
    header: dict = {"version": FORMAT_VERSION, "entries": {}}
    arrays: dict[str, np.ndarray] = {}
    for name, obj in objs.items():
        if "/" in name:
            raise ValueError(f"object name may not contain '/': {name!r}")
        arrs, meta = _flatten(name, obj)
        arrays.update(arrs)
        header["entries"][name] = meta
    arrays["__header__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load(path) -> dict[str, _t.Any]:
    """Read back a collection written by :func:`save`."""
    with np.load(path) as npz:
        header = json.loads(bytes(npz["__header__"]).decode())
        if header["version"] > FORMAT_VERSION:
            raise ValueError(
                f"file format v{header['version']} newer than supported "
                f"v{FORMAT_VERSION}")
        return {name: _unflatten(name, meta, npz)
                for name, meta in header["entries"].items()}
