"""SD checkpoint conversion CLI.

Parity: reference `cflearn/scripts/sd.py:272-332` — `convert`/`convert_v2`
(original SD → framework key mapping), `inject` (load converted states into a
live API), `convert_controlnet`.
"""

import argparse
from typing import Any, Dict

import numpy as np


def convert(ckpt_path: str, *, version: str = "v1") -> Dict[str, np.ndarray]:
    """Original SD checkpoint file → our npd (reference `sd.py:272`)."""
    from ..zoo import convert as C

    torch_sd = C.load_torch_state_dict(ckpt_path)
    return C.convert_sd(torch_sd, version=version)


def convert_v2(ckpt_path: str) -> Dict[str, np.ndarray]:
    return convert(ckpt_path, version="v2")


def inject(api: Any, npd: Dict[str, np.ndarray]) -> None:
    """Load converted states into a live DiffusionAPI (reference `sd.py:326`)."""
    from flax import nnx

    from ..toolkit.tree import npd_to_tree

    state = nnx.state(api.m)
    nnx.update(api.m, npd_to_tree(npd, state, strict=False))


def convert_controlnet(ckpt_path: str) -> Dict[str, np.ndarray]:
    """ControlNet checkpoint → our npd (reference `sd.py:332`)."""
    from ..zoo import convert as C

    return convert_controlnet_sd(C.load_torch_state_dict(ckpt_path))


def convert_controlnet_sd(torch_sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """ControlNet state dict → our npd. Uses the UNet mapping over the
    `control_model.` prefix plus the hint-block convs."""
    from ..zoo import convert as C

    mapping = C.build_unet_mapping(prefix="control_model", our_prefix="unet")
    npd = C.apply_mapping(mapping, torch_sd, strict=False)
    # zero convs + hint blocks are named directly
    for k, v in torch_sd.items():
        if k.startswith("control_model.zero_convs."):
            idx = k.split(".")[2]
            kind = "kernel" if k.endswith("weight") else "bias"
            arr = np.asarray(v)
            if kind == "kernel":
                arr = np.transpose(arr, (2, 3, 1, 0))
            npd[f"zero_convs/{idx}/{kind}/value"] = arr
        if k.startswith("control_model.input_hint_block."):
            parts = k.split(".")
            conv_idx = int(parts[2]) // 2
            kind = "kernel" if k.endswith("weight") else "bias"
            arr = np.asarray(v)
            if kind == "kernel":
                arr = np.transpose(arr, (2, 3, 1, 0))
            npd[f"hint_blocks/{conv_idx}/{kind}/value"] = arr
    return npd


def main() -> None:
    parser = argparse.ArgumentParser(description="Convert SD checkpoints to cflearn_tpu npd")
    parser.add_argument("ckpt", type=str)
    parser.add_argument("--out", type=str, required=True)
    parser.add_argument("--version", type=str, default="v1")
    parser.add_argument("--controlnet", action="store_true")
    args = parser.parse_args()
    npd = convert_controlnet(args.ckpt) if args.controlnet else convert(args.ckpt, version=args.version)
    np.savez_compressed(args.out, **npd)
    print(f"wrote {len(npd)} tensors to {args.out}")


if __name__ == "__main__":
    main()
