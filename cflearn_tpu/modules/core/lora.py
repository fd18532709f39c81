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
from typing import Dict, Optional, Tuple

import jax
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
        """Record base params for restoration. Paths touched by packs loaded
        AFTER the first capture are added incrementally — their current
        weights are still base (no pack fused them yet), so capturing late
        is safe and keeps every loaded pack fusable."""
        touched = set()
        for pack in self._packs.values():
            touched.update(pack.deltas)
        if self._backup is None:
            self._backup = {}
        missing = [k for k in touched if k not in self._backup]
        if missing:
            npd = tree_to_npd(nnx.state(module, nnx.Param))
            for k in missing:
                if k in npd:
                    self._backup[k] = npd[k].copy()

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
        fused_count = sum(
            1
            for path in self._backup
            for key in keys
            if self._packs[key].deltas.get(path) is not None
        )
        if keys and fused_count == 0:
            from ...toolkit.misc import warn_once

            warn_once(
                "apply_lora fused ZERO layers — the pack's delta paths do not "
                "match this module's param paths (wrong module, or an "
                "unconverted checkpoint?)",
                key="lora-zero-fuse",
            )
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
    def torch_lora_key_to_path(key: str, *, num_res_blocks: int = 2) -> Optional[str]:
        """Map a kohya/diffusers LoRA module key (the part before
        `.lora_down.weight`) to this repo's UNet param path. Handles both
        CompVis-style (`lora_unet_input_blocks_4_1_...`) and diffusers-style
        (`lora_unet_down_blocks_1_attentions_0_...`) names for attention
        q/k/v/out and the transformer FF. Text-encoder (`lora_te_`) keys are
        not mapped (returns None)."""
        import re

        if not key.startswith("lora_unet_"):
            return None
        name = key[len("lora_unet_") :]
        per_level = num_res_blocks + 1

        m = re.match(r"middle_block_1_(.*)$", name) or re.match(
            r"mid_block_attentions_0_(.*)$", name
        )
        if m:
            base = "unet/mid/mods/1"
            rest = m.group(1)
        else:
            m = re.match(r"(input|output)_blocks_(\d+)_1_(.*)$", name)
            if m:
                idx = int(m.group(2))
                if m.group(1) == "input":
                    # CompVis input_blocks.0 is conv_in; ours start at the
                    # first res block (zoo/convert.py:188)
                    idx -= 1
                base = f"unet/{m.group(1)}_blocks/{idx}/mods/1"
                rest = m.group(3)
            else:
                m = re.match(r"down_blocks_(\d+)_attentions_(\d+)_(.*)$", name)
                if m:
                    idx = per_level * int(m.group(1)) + int(m.group(2))
                    base = f"unet/input_blocks/{idx}/mods/1"
                    rest = m.group(3)
                else:
                    m = re.match(r"up_blocks_(\d+)_attentions_(\d+)_(.*)$", name)
                    if m:
                        idx = per_level * int(m.group(1)) + int(m.group(2))
                        base = f"unet/output_blocks/{idx}/mods/1"
                        rest = m.group(3)
                    else:
                        return None

        m = re.match(r"transformer_blocks_(\d+)_(attn[12])_(to_q|to_k|to_v|to_out)(?:_0)?$", rest)
        if m:
            return f"{base}/blocks/{m.group(1)}/{m.group(2)}/{m.group(3)}/kernel/value"
        m = re.match(r"transformer_blocks_(\d+)_ff_net_0_proj$", rest)
        if m:
            return f"{base}/blocks/{m.group(1)}/ff/net1/net/kernel/value"
        m = re.match(r"transformer_blocks_(\d+)_ff_net_2$", rest)
        if m:
            return f"{base}/blocks/{m.group(1)}/ff/linear2/kernel/value"
        return None

    @staticmethod
    def load_torch_lora(path: str, *, rank_key: str = "lora_down") -> LoRAPack:
        """Load a kohya/diffusers-style torch LoRA checkpoint into a pack:
        keys map to this repo's UNet param paths and each layer's `alpha`
        tensor folds its alpha/rank scale into the down matrix (reference
        `hijacks.py:130` alpha_scale). Unmappable layers are skipped with a
        one-time warning."""
        from ...toolkit.misc import warn_once
        from ...zoo.convert import load_torch_state_dict

        sd = load_torch_state_dict(path)
        deltas: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        rank = 4
        skipped = 0
        for k, v in sd.items():
            if ".lora_down" not in k:
                continue
            up_k = k.replace(".lora_down", ".lora_up")
            if up_k not in sd:
                continue
            module_key = k.split(".lora_down")[0]
            target = LoRAManager.torch_lora_key_to_path(module_key)
            if target is None:
                skipped += 1
                continue
            down_t = np.asarray(v, dtype=np.float32)
            up_t = np.asarray(sd[up_k], dtype=np.float32)
            layer_rank = int(down_t.shape[0])
            rank = layer_rank
            alpha_k = module_key + ".alpha"
            if alpha_k in sd:
                down_t = down_t * (float(np.asarray(sd[alpha_k])) / layer_rank)
            # torch linear: (rank, in) / (out, rank) → ours: (in, rank) / (rank, out)
            deltas[target] = (down_t.T, up_t.T)
        if skipped:
            warn_once(
                f"skipped {skipped} unmappable LoRA layers (text-encoder/"
                "conv LoRAs are not mapped yet)",
                key="lora-skip",
            )
        # per-layer alpha is folded into `down` → pack-level scale stays 1
        return LoRAPack(deltas, rank=rank, alpha=float(rank))
