"""Checkpoint save/restore with the reference's semantics.

Saved payload mirrors chem_tensorflow.py:309-323: a pickle of
  {"params": <resolved config dict>,
   "weights": {flattened-name -> ndarray},     # params AND optimizer state
   "train_step": int, "valid_step": int}

Restore (chem_tensorflow.py:330-359):
  * asserts the configs match except `task_ids` and `num_epochs`;
  * assigns every saved weight whose name matches the current pytree;
  * keeps the fresh initialization for missing names (warns) — this is
    what allows restoring a checkpoint into a model with new task heads;
  * warns about saved names the model doesn't use.

Two on-disk formats share these semantics:
  * pickle (default, `.pickle` path) — the reference's format contract;
  * Orbax (directory path) — multi-host-safe async-capable TPU-native
    storage; the flattened name->array dict plus a metadata JSON live in
    an `ocp.StandardCheckpointer` tree, so partial restore and the
    config-compat check behave identically.
"""

import json
import os
import pickle
from typing import Dict, Tuple

import jax
import numpy as np


def _flatten_named(tree) -> Dict[str, np.ndarray]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def _is_orbax_path(path: str) -> bool:
    return not path.endswith(".pickle") and not path.endswith(".pkl")


def _sanitize(name: str) -> str:
    """keystr -> storage-safe name: "['a']['b'][0].c" -> "a.b.0.c".
    Handles DictKey, SequenceKey AND GetAttrKey segments — dropping
    attribute segments (NamedTuple pytree nodes, e.g. optax state)
    would collide distinct leaves onto one storage key and silently
    overwrite one with the other (round-5 review; save_checkpoint
    additionally refuses on any collision)."""
    import re
    parts = re.findall(
        r"\['([^']+)'\]|\[(\d+)\]|\.([A-Za-z_][A-Za-z0-9_]*)", name)
    return ".".join(a or b or c for a, b, c in parts)


def _sanitize_legacy(name: str) -> str:
    """Pre-round-5 sanitization (attribute segments dropped) — restore
    fallback so Orbax checkpoints written by older builds still load."""
    import re
    parts = re.findall(r"\['([^']+)'\]|\[(\d+)\]", name)
    return ".".join(a or b for a, b in parts)


def save_checkpoint(path: str, config: Dict, state_tree,
                    train_step: int, valid_step: int,
                    iterator_state: Dict = None) -> None:
    """`iterator_state` (optional) captures mid-epoch data-iterator
    position (SURVEY §5.3 resumable-iterator plan): epoch number, steps
    already consumed, the numpy RNG state as of the epoch start (the
    shuffle seed of the epoch's batch stream) and the jax key at the
    save point — enough to resume training mid-epoch deterministically.
    """
    weights = _flatten_named(state_tree)
    if _is_orbax_path(path):
        try:
            import orbax.checkpoint as ocp
        except ImportError as exc:  # clear routing error, not a stack
            raise ImportError(
                f"'{path}' has no .pickle/.pkl extension, which selects "
                "the Orbax checkpoint format, but orbax-checkpoint is "
                "not installed — use a .pickle path or install orbax"
            ) from exc
        path = os.path.abspath(path)
        meta = {"params": config, "train_step": train_step,
                "valid_step": valid_step, "sanitized_keys": True}
        if iterator_state is not None:
            meta["iterator_state"] = _encode_iterator_state(iterator_state)
        sanitized = {}
        for k, v in weights.items():
            sk = _sanitize(k)
            if sk in sanitized:
                raise ValueError(
                    f"checkpoint key collision: two leaves sanitize to "
                    f"'{sk}' — saving would silently drop one")
            sanitized[sk] = v
        weights = sanitized
        with ocp.StandardCheckpointer() as ckptr:
            # Orbax refuses to overwrite; stage then atomically replace.
            tmp = path + ".tmp_new"
            ckptr.save(tmp, weights, force=True)
        with open(os.path.join(tmp, "ggnn_meta.json"), "w") as f:
            json.dump(meta, f)
        # Two renames instead of rmtree-then-replace: a crash between
        # them leaves either the old checkpoint (at .tmp_old) or the
        # complete new one (at .tmp_new), never nothing — and
        # _load_payload knows to fall back to .tmp_new. (os.replace
        # cannot swap onto a non-empty directory.)
        old = path + ".tmp_old"
        import shutil
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.replace(path, old)
        os.replace(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
        return
    payload = {
        "params": config,
        "weights": weights,
        "train_step": train_step,
        "valid_step": valid_step,
    }
    if iterator_state is not None:
        payload["iterator_state"] = iterator_state
    with open(path, "wb") as f:
        pickle.dump(payload, f, pickle.HIGHEST_PROTOCOL)


def _encode_iterator_state(it: Dict) -> Dict:
    """JSON-safe encoding (Orbax meta sidecar): the numpy RNG state's
    array becomes a list."""
    out = dict(it)
    if "np_rng_state" in out:
        name, keys, pos, has_gauss, gauss = out["np_rng_state"]
        out["np_rng_state"] = [name, [int(k) for k in keys], int(pos),
                               int(has_gauss), float(gauss)]
    if "key" in out:
        out["key"] = [int(x) for x in np.asarray(out["key"]).ravel()]
    return out


def _decode_iterator_state(it: Dict) -> Dict:
    out = dict(it)
    if "np_rng_state" in out and isinstance(out["np_rng_state"], list):
        name, keys, pos, has_gauss, gauss = out["np_rng_state"]
        out["np_rng_state"] = (name, np.asarray(keys, np.uint32), pos,
                               has_gauss, gauss)
    if "key" in out and isinstance(out["key"], list):
        out["key"] = np.asarray(out["key"], np.uint32)
    return out


def load_iterator_state(path: str):
    """The saved mid-epoch iterator state, or None."""
    if os.path.isdir(path):
        # Orbax: the state lives in the JSON sidecar — don't restore
        # the full weight tree just to read it.
        with open(os.path.join(path, "ggnn_meta.json")) as f:
            it = json.load(f).get("iterator_state")
        return _decode_iterator_state(it) if it else None
    payload = _load_payload(path)
    it = payload.get("iterator_state")
    return _decode_iterator_state(it) if it else None


def _load_payload(path: str) -> Dict:
    if not os.path.exists(path) and os.path.isdir(path + ".tmp_new"):
        # Crash-window recovery: trust the staged Orbax checkpoint only
        # if its meta sidecar (written last) is present and parses — a
        # crash DURING staging leaves a directory without valid meta,
        # and redirecting to it would turn "no checkpoint" into an
        # opaque JSONDecodeError (round-5 review).
        staged_meta = os.path.join(path + ".tmp_new", "ggnn_meta.json")
        try:
            with open(staged_meta) as f:
                json.load(f)
            path = path + ".tmp_new"
        except (OSError, json.JSONDecodeError):
            raise FileNotFoundError(
                f"no checkpoint at '{path}'; an INCOMPLETE staged "
                f"checkpoint exists at '{path}.tmp_new' (crash during "
                "save) — delete it and restore an earlier checkpoint")
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        with open(os.path.join(path, "ggnn_meta.json")) as f:
            meta = json.load(f)
        with ocp.StandardCheckpointer() as ckptr:
            weights = ckptr.restore(os.path.abspath(path))
        return {"params": meta["params"], "weights": weights,
                "train_step": meta["train_step"],
                "valid_step": meta["valid_step"],
                "iterator_state": meta.get("iterator_state"),
                "sanitized_keys": meta.get("sanitized_keys", False)}
    with open(path, "rb") as f:
        return pickle.load(f)


def _looks_tf1(payload: Dict) -> bool:
    """Reference-produced pickles key weights by TF variable name
    (scope/paths with '/'); this framework's use keystr/sanitized names."""
    weights = payload.get("weights", {})
    return any("/" in str(k) for k in weights)


def restore_checkpoint(path: str, config: Dict, state_tree,
                       log=print, *, variant: str = None,
                       num_edge_types: int = None,
                       payload: Dict = None) -> Tuple[object, int, int]:
    """Returns (restored_state_tree, train_step, valid_step).

    Accepts this framework's checkpoints (pickle or Orbax dir) AND
    reference-produced TF1 pickles (chem_tensorflow.py:309-323) when
    `variant`/`num_edge_types` are given — the TF variable names are
    converted through ggnn_tpu.compat.tf1 and the optimizer state stays
    freshly initialized (the reference stores TF-Adam slots that have no
    place in the optax tree).

    `payload` skips the load when the caller already holds the loaded
    checkpoint (serving loads it once for geometry inference — a second
    full Orbax restore/pickle parse would double the load cost).
    """
    if payload is None:
        payload = _load_payload(path)

    if _looks_tf1(payload):
        if variant is None or num_edge_types is None:
            raise ValueError(
                "TF1 reference checkpoint detected; restore it through "
                "Runner/Predictor (variant + metadata required)")
        from ggnn_tpu.compat.tf1 import params_from_tf1_weights
        saved_config = payload["params"]
        for par, par_value in config.items():
            if par in ("task_ids", "num_epochs") or par not in saved_config:
                continue
            assert par_value == saved_config[par], (
                f"config mismatch on '{par}': {par_value!r} != "
                f"{saved_config[par]!r}")
        new_state = dict(state_tree)
        skeleton_heads = state_tree.get("params", {}).get("heads")
        new_state["params"] = params_from_tf1_weights(
            variant, payload["weights"], config, num_edge_types,
            fallback_heads=skeleton_heads, log=log)
        log(f"Imported TF1 reference checkpoint {path}")
        return (new_state, payload.get("train_step", 0),
                payload.get("valid_step", 0))

    saved_config = payload["params"]
    # Explicit raises, not `assert` statements: python -O strips
    # asserts and restoring a wrong-config checkpoint is exactly the
    # user-reachable error class that must not vanish. AssertionError
    # is kept as the TYPE for reference parity (chem_tensorflow.py:336
    # uses asserts; callers/tests catch AssertionError).
    if len(config) != len(saved_config):
        extra = sorted(set(config) - set(saved_config))
        missing = sorted(set(saved_config) - set(config))
        raise AssertionError(
            "checkpoint config has a different key set "
            f"(only in current: {extra}; only in checkpoint: {missing})")
    for par, par_value in config.items():
        if par in ("task_ids", "num_epochs"):
            continue
        if par not in saved_config:
            raise AssertionError(
                f"config key '{par}' absent from the checkpoint "
                "(same size, different key set)")
        if par_value != saved_config[par]:
            raise AssertionError(
                f"config mismatch on '{par}': {par_value!r} != "
                f"{saved_config[par]!r}")

    saved = payload["weights"]
    key_fn = _sanitize if payload.get("sanitized_keys") else (lambda s: s)
    used = set()
    split_rows_used: Dict[str, int] = {}  # base name -> max index + 1
    paths_and_leaves, treedef = jax.tree_util.tree_flatten_with_path(state_tree)
    new_leaves = []
    legacy_fn = (_sanitize_legacy if payload.get("sanitized_keys")
                 else None)
    for path, leaf in paths_and_leaves:
        name = key_fn(jax.tree_util.keystr(path))
        if name not in saved and legacy_fn is not None:
            # Orbax checkpoints from builds whose sanitizer dropped
            # attribute segments stored this leaf under the legacy key.
            legacy = legacy_fn(jax.tree_util.keystr(path))
            if legacy in saved:
                name = legacy
        used.add(name)
        if name in saved:
            val = saved[name]
            if tuple(np.shape(val)) != tuple(np.shape(leaf)):
                # Loudly, at restore time: geometry that the config
                # compat check cannot see (num_edge_types comes from
                # the DATA) would otherwise surface as an opaque XLA
                # shape error mid-step — or not at all when the shapes
                # happen to broadcast (round-5 review).
                raise ValueError(
                    f"checkpoint leaf '{name}' has shape "
                    f"{tuple(np.shape(val))} but the model expects "
                    f"{tuple(np.shape(leaf))} (e.g. a different "
                    "num_edge_types inferred from the dataset)")
            new_leaves.append(jax.numpy.asarray(val))
            continue
        # Legacy stacked-leaf compatibility: where the skeleton holds a
        # LIST of per-index leaves (e.g. the async model's per-type
        # edge_weights, split for per-variable clip parity) but the
        # checkpoint predates the split and stores one stacked array
        # under the base name, slice it instead of fresh-initializing.
        if path and isinstance(path[-1], jax.tree_util.SequenceKey):
            base = key_fn(jax.tree_util.keystr(path[:-1]))
            idx = path[-1].idx
            stacked = saved.get(base)
            if (stacked is not None and np.ndim(stacked) == np.ndim(leaf) + 1
                    and idx < np.shape(stacked)[0]
                    and tuple(np.shape(stacked)[1:]) == tuple(np.shape(leaf))):
                if base not in used:
                    log(f"Splitting legacy stacked {base} across "
                        f"{np.shape(stacked)[0]} per-index leaves.")
                used.add(base)
                split_rows_used[base] = max(split_rows_used.get(base, 0),
                                            idx + 1)
                new_leaves.append(jax.numpy.asarray(stacked[idx]))
                continue
        log(f"Freshly initializing {name} since no saved value was found.")
        new_leaves.append(leaf)
    for name in saved:
        if name not in used:
            log(f"Saved weights for {name} not used by model.")
        elif name in split_rows_used:
            # Marking the base "used" must not hide surplus rows: a
            # stacked array with more rows than the model has per-index
            # leaves means part of the checkpoint was silently dropped.
            surplus = np.shape(saved[name])[0] - split_rows_used[name]
            if surplus > 0:
                log(f"Saved stacked {name} has {surplus} surplus row(s) "
                    f"beyond the model's {split_rows_used[name]} "
                    "per-index leaves; the extra rows were not used.")

    restored = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return restored, payload["train_step"], payload["valid_step"]
