"""Pytree/nnx-state ↔ flat numpy-dict helpers.

These implement the checkpoint payload contract (flat `path → array` dicts,
saved as npz) used by model serialization — the TPU-native analogue of the
reference's `torch.save({"config": ..., "states": state_dict})`
(`cflearn/schema.py:1377-1389`).
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _key_entry_to_str(entry: Any) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


_KEY_SUFFIX = "::prngkey"


def tree_to_npd(tree: Any) -> Dict[str, np.ndarray]:
    """Flatten any pytree (incl. `nnx.State`) into `{path: np.ndarray}`.

    Typed PRNG keys are stored as their raw uint32 data with a marker suffix
    so `npd_to_tree` can rewrap them."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    npd: Dict[str, np.ndarray] = {}
    for path, leaf in flat:
        key = "/".join(_key_entry_to_str(p) for p in path)
        if hasattr(leaf, "dtype") and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            npd[key + _KEY_SUFFIX] = np.asarray(jax.random.key_data(leaf))
        else:
            npd[key] = np.asarray(leaf)
    return npd


def convert_pp_layout(npd: Dict[str, np.ndarray], template: Any) -> Dict[str, np.ndarray]:
    """Bridge the two parameter layouts of `MixedStackedEncoder` so checkpoints
    stay portable across the `pipeline_parallel` flag (ADVICE r3).

    `pipeline_parallel=True` stacks the L per-block states once at init into a
    single `pp_block/*` template whose leaves carry a leading L axis, replacing
    the `blocks/{i}/*` module list. Train-with-PP/serve-without (and the
    reverse) therefore see a different flat-key layout. This pass rewrites
    `npd` toward `template`'s layout:

    - template wants `…/pp_block/rest`, npd has `…/blocks/{i}/rest` → stack
      the i leaves on a new leading axis (shape-checked against the template);
    - template wants `…/blocks/{i}/rest`, npd has `…/pp_block/rest` → slice
      row i off the stacked leaf;
    - a PP model's encoder-level `pp_aux` scalar (stale accumulator, zero
      between steps) is synthesized as zeros when absent.

    Keys already present pass through untouched; npd keys nothing consumes
    are left for `npd_to_tree` to ignore."""
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    out = dict(npd)
    for path, leaf in flat:
        key = "/".join(_key_entry_to_str(p) for p in path)
        if key in out or key + _KEY_SUFFIX in out:
            continue
        if "pp_block/" in key:
            prefix, rest = key.split("pp_block/", 1)
            suffix = _KEY_SUFFIX if f"{prefix}blocks/0/{rest}{_KEY_SUFFIX}" in npd else ""
            parts = []
            while f"{prefix}blocks/{len(parts)}/{rest}{suffix}" in npd:
                parts.append(npd[f"{prefix}blocks/{len(parts)}/{rest}{suffix}"])
            if parts:
                stacked = np.stack(parts)
                if not suffix and hasattr(leaf, "shape") and tuple(stacked.shape) != tuple(leaf.shape):
                    raise ValueError(
                        f"pp layout conversion for {key!r}: stacked {len(parts)} "
                        f"blocks -> {stacked.shape}, expected {tuple(leaf.shape)}"
                    )
                out[key + suffix] = stacked
        elif "blocks/" in key:
            prefix, tail = key.split("blocks/", 1)
            idx, _, rest = tail.partition("/")
            src = f"{prefix}pp_block/{rest}"
            suffix = _KEY_SUFFIX if src + _KEY_SUFFIX in npd else ""
            if idx.isdigit() and src + suffix in npd:
                out[key + suffix] = np.asarray(npd[src + suffix])[int(idx)]
        elif "pp_aux" in key and hasattr(leaf, "shape"):
            # only when the source layout was blocks/{i} (i.e. a conversion is
            # actually happening) — a plain missing key stays missing
            sibling = key.split("pp_aux", 1)[0] + "blocks/0/"
            if any(k.startswith(sibling) for k in npd):
                out[key] = np.zeros(leaf.shape, leaf.dtype)
    return out


def npd_to_tree(npd: Dict[str, np.ndarray], template: Any, *, strict: bool = True) -> Any:
    """Rebuild a pytree with `template`'s structure, leaves taken from `npd`."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    missing = []
    for path, leaf in flat:
        key = "/".join(_key_entry_to_str(p) for p in path)
        is_prng = hasattr(leaf, "dtype") and jax.dtypes.issubdtype(leaf.dtype, jax.dtypes.prng_key)
        if is_prng and key + _KEY_SUFFIX in npd:
            import jax.random as jrandom

            impl = jax.random.key_impl(leaf)
            leaves.append(jrandom.wrap_key_data(npd[key + _KEY_SUFFIX], impl=impl))
        elif key in npd:
            value = npd[key]
            if hasattr(leaf, "dtype") and not is_prng and value.dtype != leaf.dtype:
                value = value.astype(leaf.dtype)
            # hand out jax arrays, not numpy: raw (often read-only) numpy
            # leaves would poison nnx Variables for later in-place updates
            leaves.append(jnp.asarray(value))
        else:
            missing.append(key)
            leaves.append(leaf)
    if strict and missing:
        raise KeyError(f"missing {len(missing)} keys in npd, e.g. {missing[:5]}")
    unflat_leaves = [leaf for _, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def tree_num_params(tree: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree) if hasattr(x, "shape"))


def tree_byte_size(tree: Any) -> int:
    total = 0
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            total += int(np.prod(x.shape)) * np.dtype(x.dtype).itemsize
    return total


def tree_cast(tree: Any, dtype: Any) -> Any:
    import jax.numpy as jnp

    def _cast(x: Any) -> Any:
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)


def global_norm(tree: Any) -> jax.Array:
    import jax.numpy as jnp

    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves))


def split_key_tree(key: jax.Array, template: Any) -> Tuple[Any, ...]:
    leaves, treedef = jax.tree_util.tree_flatten(template)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))
