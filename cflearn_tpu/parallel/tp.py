"""Tensor-parallel parameter placement rules.

SURVEY.md §2.10 decision: TP = model-axis sharding of attention heads / MLP
hidden dims, expressed as NamedSharding placements — GSPMD inserts the
all-reduces over ICI (Megatron-style column→row parallel pairs become one
psum per block, chosen by XLA). No module code changes: placement is a pure
param-tree transform, composing with fsdp sharding of the remaining params.
"""

import re
from typing import Any, List, Optional, Pattern, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (pattern, partition kind): "col" shards the OUTPUT dim, "row" the INPUT dim
_DEFAULT_TP_RULES: List[Tuple[str, str]] = [
    # attention projections: q/k/v column-parallel, out row-parallel
    (r".*/to_q/kernel.*", "col"),
    (r".*/to_k/kernel.*", "col"),
    (r".*/to_v/kernel.*", "col"),
    (r".*/to_qkv/kernel.*", "col"),
    (r".*/in_proj/kernel.*", "col"),
    (r".*/(q|k|v)_proj/kernel.*", "col"),
    (r".*/to_out/kernel.*", "row"),
    (r".*/out_proj/kernel.*", "row"),
    # MLP / feed-forward: fc1 col, fc2 row (covers CLIP + transformer FF)
    (r".*/fc1/kernel.*", "col"),
    (r".*/fc2/kernel.*", "row"),
    (r".*/ff/net1/net/kernel.*", "col"),
    (r".*/ff/linear2/kernel.*", "row"),
    # time embedding MLP
    (r".*/time_fc1/kernel.*", "col"),
    (r".*/time_fc2/kernel.*", "row"),
    # MoE expert tensors (leading num_experts axis): EP = expert-axis
    # sharding over the `model` axis — GSPMD inserts the dispatch/combine
    # all-to-alls around `MoEChannelMixer`'s one-hot einsums
    (r".*/experts_(w1|w2|b1|b2).*", "expert"),
]


def compile_rules(rules: Optional[Sequence[Tuple[str, str]]] = None) -> List[Tuple[Pattern, str]]:
    return [(re.compile(p), kind) for p, kind in (rules or _DEFAULT_TP_RULES)]


def tp_spec_for(path: str, shape: Sequence[int], tp_size: int, rules: List[Tuple[Pattern, str]]) -> Optional[P]:
    """PartitionSpec for a param under TP, or None for replicate."""
    if len(shape) < 2 or tp_size <= 1:
        return None
    for pattern, kind in rules:
        if pattern.match(path):
            if kind == "expert" and shape[0] % tp_size == 0:
                spec = [None] * len(shape)
                spec[0] = "model"
                return P(*spec)
            if kind == "col" and shape[-1] % tp_size == 0:
                spec: List[Any] = [None] * len(shape)
                spec[-1] = "model"
                return P(*spec)
            if kind == "row" and shape[-2] % tp_size == 0:
                spec = [None] * len(shape)
                spec[-2] = "model"
                return P(*spec)
    return None


def _is_pp_block(path: str) -> bool:
    """Init-time-stacked pipeline leaves (leading axis = L blocks)."""
    return "/pp_block/" in path or path.startswith("pp_block/")


def pp_spec_for(
    path: str, shape: Sequence[int], pipe_size: int, tp_size: int, rules: List[Tuple[Pattern, str]]
) -> Optional[P]:
    """PartitionSpec for an init-time-stacked pipeline-block param
    (`MixedStackedEncoder.pp_block`, leading axis = L blocks): dim 0 shards
    over `pipe` (stage groups), the inner dims keep their TP rule — this is
    what lets TP/EP compose with PP (the partial-manual shard_map in
    `parallel.pp` leaves `model` automatic inside the pipeline region)."""
    if not _is_pp_block(path):
        return None
    if pipe_size <= 1 or len(shape) < 1 or shape[0] % pipe_size != 0:
        return None
    inner: Tuple[Any, ...] = (None,) * (len(shape) - 1)
    if tp_size > 1 and len(shape) >= 3:
        inner_spec = tp_spec_for(path, shape[1:], tp_size, rules)
        if inner_spec is not None:
            inner = tuple(inner_spec) + (None,) * (len(shape) - 1 - len(tuple(inner_spec)))
    return P("pipe", *inner)


def place_params(
    state: Any,
    mesh: Mesh,
    *,
    use_fsdp: bool = False,
    tp_rules: Optional[Sequence[Tuple[str, str]]] = None,
) -> Any:
    """Place a state pytree: pipeline-stacked params first (pipe axis + TP
    inner dims), then TP rules, then fsdp largest-axis sharding, else
    replicate. Operates on any nnx State / pytree via path strings."""
    tp_size = mesh.shape.get("model", 1)
    fsdp_size = mesh.shape.get("fsdp", 1)
    pipe_size = mesh.shape.get("pipe", 1)
    rules = compile_rules(tp_rules)
    from ..toolkit.tree import _key_entry_to_str

    flat, treedef = jax.tree_util.tree_flatten_with_path(state)
    placed = []
    for path_entries, leaf in flat:
        path = "/".join(_key_entry_to_str(p) for p in path_entries)
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            placed.append(jax.device_put(leaf, NamedSharding(mesh, P())))
            continue
        spec = pp_spec_for(path, leaf.shape, pipe_size, tp_size, rules)
        if spec is None and tp_size > 1:
            if _is_pp_block(path):
                # stacked pipeline leaves on a pipe-less mesh: never rule-match
                # the full stacked shape — the 'expert' rule would shard the
                # leading BLOCK axis over `model` (ADVICE r3). Strip the block
                # axis, match the inner shape, shift the spec right by one.
                inner_spec = (
                    tp_spec_for(path, leaf.shape[1:], tp_size, rules)
                    if len(leaf.shape) >= 2
                    else None
                )
                spec = P(None, *inner_spec) if inner_spec is not None else None
            else:
                spec = tp_spec_for(path, leaf.shape, tp_size, rules)
        if spec is None and use_fsdp and fsdp_size > 1:
            from .mesh import fsdp_param_sharding

            placed.append(jax.device_put(leaf, fsdp_param_sharding(mesh, leaf.shape)))
            continue
        sharding = NamedSharding(mesh, spec if spec is not None else P())
        placed.append(jax.device_put(leaf, sharding))
    return jax.tree_util.tree_unflatten(treedef, placed)


def describe_placement(state: Any, mesh: Mesh, **kwargs: Any) -> List[Tuple[str, str]]:
    """Debug helper: list (path, spec) for sharded params."""
    tp_size = mesh.shape.get("model", 1)
    rules = compile_rules(kwargs.get("tp_rules"))
    from ..toolkit.tree import _key_entry_to_str

    out = []
    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    for path_entries, leaf in flat:
        path = "/".join(_key_entry_to_str(p) for p in path_entries)
        if hasattr(leaf, "shape"):
            spec = tp_spec_for(path, leaf.shape, tp_size, rules)
            if spec is not None:
                out.append((path, str(spec)))
    return out
