"""Misc foundation utilities.

Parity: reference `cflearn/toolkit.py` — `seed_everything` (:103),
`check_is_ci` (:177), file sha helpers (:279-328), download system (:329-567),
batch converters (:1182-1235), `WeightsStrategy` (:671), EMA/slerp math
(:2737-2996). TPU-native: seeds return `jax.random.PRNGKey`s; batch conversion
targets jax arrays; device helpers speak `jax.Device`/mesh.
"""

import hashlib
import json
import os
import random
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import WORKSPACE_ENVIRON_KEY
from ..parameters import OPT

arr_type = Union[np.ndarray, jax.Array]
np_dict_type = Dict[str, Union[np.ndarray, Any]]
tensor_dict_type = Dict[str, Union[jax.Array, Any]]


# ----------------------------------------------------------------------------
# env / seeding
# ----------------------------------------------------------------------------

def check_is_ci() -> bool:
    """Reference `toolkit.py:177` — CI flag flips configs into 1-step debug mode."""
    return bool(int(os.environ.get("CI", "0")))


def get_workspace_environ() -> Optional[str]:
    return os.environ.get(WORKSPACE_ENVIRON_KEY)


_seed: Optional[int] = None


def seed_everything(seed: Optional[int] = None) -> int:
    """Seed python/numpy RNGs and record the seed for `new_rng_key`.

    Reference `toolkit.py:103`. JAX randomness is functional, so this records
    the seed; modules draw keys via `jax.random.PRNGKey(seed)` streams.
    """
    global _seed
    if seed is None:
        seed = random.randint(0, 2**31 - 1)
    random.seed(seed)
    np.random.seed(seed % (2**32))
    _seed = seed
    return seed


def get_seed() -> int:
    return _seed if _seed is not None else 0


def new_rng_key(seed: Optional[int] = None) -> jax.Array:
    return jax.random.PRNGKey(get_seed() if seed is None else seed)


# ----------------------------------------------------------------------------
# hashing / files / download cache
# ----------------------------------------------------------------------------

def random_hash() -> str:
    """Short unique id (reference `cftool.misc.random_hash` — used for temp
    registrations, e.g. `api/cv/vq_vae.py:30`)."""
    import uuid

    return uuid.uuid4().hex


def get_latest_workspace(root: Union[str, Path]) -> Optional[Path]:
    """Most recent run folder under a workspace root (reference
    `cftool.misc.get_latest_workspace` — run folders are timestamp-named)."""
    root = Path(root)
    if not root.is_dir():
        return None
    candidates = [p for p in root.iterdir() if p.is_dir()]
    if not candidates:
        return None
    return max(candidates, key=lambda p: p.stat().st_mtime)


def hash_code(code: str) -> str:
    return hashlib.md5(code.encode()).hexdigest()[:8]


def get_file_size(path: str) -> int:
    return os.path.getsize(path)


def check_sha_with(path: str, tgt_sha: str) -> bool:
    """Reference `toolkit.py:304` — sha256 check of a file."""
    return compute_sha(path) == tgt_sha


def get_download_cache_dir() -> Path:
    folder = Path(OPT.cache_dir) / "download"
    folder.mkdir(parents=True, exist_ok=True)
    return folder


_verified_downloads: set = set()


def compute_sha(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _tofu_sha_file(dst_folder: Path) -> Path:
    return dst_folder / ".sha256.json"


def _tofu_get(dst_folder: Path, fname: str) -> Optional[str]:
    f = _tofu_sha_file(dst_folder)
    if not f.is_file():
        return None
    try:
        return json.loads(f.read_text()).get(fname)
    except Exception:  # noqa: BLE001
        return None


def _tofu_put(dst_folder: Path, fname: str, sha: str) -> None:
    f = _tofu_sha_file(dst_folder)
    try:
        d = json.loads(f.read_text()) if f.is_file() else {}
    except Exception:  # noqa: BLE001
        d = {}
    d[fname] = sha
    f.write_text(json.dumps(d, indent=2, sort_keys=True))


def download(
    url: str,
    *,
    name: Optional[str] = None,
    folder: Optional[str] = None,
    sha: Optional[str] = None,
    sha_prefix: Optional[str] = None,
    min_size: Optional[int] = None,
    retries: int = 2,
) -> Path:
    """Download + cache + sha verification (reference `toolkit.py:450-567`).

    When `sha` is recorded in the checkpoint index it is enforced on every
    cache hit and fresh download. When the index has no sha (upstream-hosted
    files whose digests cannot be computed without egress), verification is
    trust-on-first-use: the sha256 of the first successful download is
    recorded in a `.sha256.json` sidecar next to the cache, and later cache
    hits must still match it — so post-download corruption or tampering is
    caught either way.

    Weak checks for entries whose full digest cannot be recorded offline
    (zoo index justification fields):
    - `sha_prefix`: torch-hub filename convention — the first hex chars of
      the sha256 are embedded in the artifact filename (e.g.
      `vgg16-397923af.pth`, `dpt_large-midas-2f21e586.pt`), so a prefix
      check is REAL end-to-end verification derivable offline.
    - `min_size`: lower byte bound; catches the common corruption mode of a
      truncated transfer or an HTML error page cached as a checkpoint.

    In zero-egress environments this raises a clear error when the file is not
    already cached; callers (the zoo) treat pretrained weights as optional.
    """
    import urllib.request

    def weak_checks(p: Path, digest: Optional[str]) -> None:
        if min_size is not None and p.stat().st_size < min_size:
            raise IOError(
                f"{p.name} is {p.stat().st_size} bytes — smaller than the "
                f"recorded minimum {min_size} (truncated download?)"
            )
        if sha_prefix is not None and digest is not None and not digest.startswith(sha_prefix):
            raise IOError(
                f"sha mismatch for {p.name}: digest {digest[:16]}… does not "
                f"start with the filename-recorded prefix {sha_prefix}"
            )

    dst_folder = Path(folder) if folder is not None else get_download_cache_dir()
    dst_folder.mkdir(parents=True, exist_ok=True)
    fname = name or url.split("/")[-1]
    path = dst_folder / fname
    if path.is_file():
        # hash multi-GB checkpoints at most once per process — later cache
        # hits are a stat() away, like before TOFU pinning existed
        verify_key = (str(path), sha, sha_prefix, min_size)
        if verify_key in _verified_downloads:
            return path
        pinned = sha or _tofu_get(dst_folder, fname)
        if pinned is None:
            digest = compute_sha(str(path))
            weak_checks(path, digest)
            _tofu_put(dst_folder, fname, digest)
            _verified_downloads.add(verify_key)
            return path
        if check_sha_with(str(path), pinned):
            weak_checks(path, pinned)
            _verified_downloads.add(verify_key)
            return path
        # fall through to re-download the corrupted file
    err: Optional[Exception] = None
    pinned = sha or _tofu_get(dst_folder, fname)
    for _ in range(max(1, retries)):
        try:
            urllib.request.urlretrieve(url, str(path))
            got = compute_sha(str(path))
            if pinned is not None and got != pinned:
                raise IOError(f"sha mismatch for {fname}")
            weak_checks(path, got)
            _tofu_put(dst_folder, fname, got)
            return path
        except Exception as e:  # noqa: BLE001
            err = e
            time.sleep(1)
    raise IOError(f"failed to download {url}: {err}")


def download_json(url: str, **kwargs: Any) -> Dict[str, Any]:
    with open(download(url, **kwargs), "r") as f:
        return json.load(f)


# ----------------------------------------------------------------------------
# batch conversion — the host↔device boundary
# ----------------------------------------------------------------------------

def np_batch_to_jax(batch: np_dict_type) -> tensor_dict_type:
    """numpy dict batch → jax arrays (reference `np_batch_to_tensor`, `toolkit.py:1182`)."""
    return {
        k: jnp.asarray(v) if isinstance(v, np.ndarray) and v.dtype != object else v
        for k, v in batch.items()
    }


def jax_batch_to_np(batch: tensor_dict_type) -> np_dict_type:
    """jax dict batch → numpy (reference `tensor_batch_to_np`, `toolkit.py:1209`)."""
    return {k: np.asarray(v) if isinstance(v, jax.Array) else v for k, v in batch.items()}


def to_jax_dtype(x: np.ndarray) -> np.ndarray:
    """Normalize dtypes for device transfer: f64→f32, i64→i32."""
    if x.dtype == np.float64:
        return x.astype(np.float32)
    if x.dtype == np.int64:
        return x.astype(np.int32)
    if x.dtype == np.bool_:
        return x
    return x


# ----------------------------------------------------------------------------
# math helpers (reference `toolkit.py:2737-2996`)
# ----------------------------------------------------------------------------

def slerp(
    x1: jax.Array,
    x2: jax.Array,
    r1: Union[float, jax.Array],
    r2: Optional[Union[float, jax.Array]] = None,
    *,
    dot_threshold: float = 0.9995,
) -> jax.Array:
    """Spherical interpolation (reference `toolkit.py:2737`)."""
    if r2 is None:
        r2 = 1.0 - r1
    b, *shape = x1.shape
    x1f = x1.reshape(b, -1)
    x2f = x2.reshape(b, -1)
    low_norm = x1f / jnp.linalg.norm(x1f, axis=1, keepdims=True)
    high_norm = x2f / jnp.linalg.norm(x2f, axis=1, keepdims=True)
    dot = jnp.sum(low_norm * high_norm, axis=1, keepdims=True)
    omega = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    so = jnp.sin(omega)
    lerped = r1 * x1f + r2 * x2f
    slerped = (jnp.sin(r1 * omega) / so) * x1f + (jnp.sin(r2 * omega) / so) * x2f
    out = jnp.where(jnp.abs(dot) > dot_threshold, lerped, slerped)
    return out.reshape(b, *shape)


def mean_std(x: jax.Array, eps: float = 1e-5) -> Any:
    """Per-(B,C) spatial mean/std for NHWC features (reference `toolkit.py:2880`)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return mean, jnp.sqrt(var + eps)


def adain_with_params(src: jax.Array, mean: jax.Array, std: jax.Array) -> jax.Array:
    src_mean, src_std = mean_std(src)
    return std * (src - src_mean) / src_std + mean


def adain_with_tgt(src: jax.Array, tgt: jax.Array) -> jax.Array:
    tgt_mean, tgt_std = mean_std(tgt)
    return adain_with_params(src, tgt_mean, tgt_std)


def interpolate_fn(x: np.ndarray, y: np.ndarray, x_new: np.ndarray) -> np.ndarray:
    return np.interp(x_new, x, y)


# ----------------------------------------------------------------------------
# sample-weight schedules (reference `WeightsStrategy`, `toolkit.py:671`)
# ----------------------------------------------------------------------------

class WeightsStrategy:
    d: Dict[str, Callable[[int], Optional[np.ndarray]]] = {}

    def __init__(self, strategy: Optional[str]) -> None:
        self.strategy = strategy

    def __call__(self, num: int) -> Optional[np.ndarray]:
        if self.strategy is None:
            return None
        return getattr(self, self.strategy)(num)

    def linear_decay(self, num: int) -> np.ndarray:
        return np.linspace(0, 1, num + 1)[1:]

    def radius_decay(self, num: int) -> np.ndarray:
        return np.sin(np.arccos(1.0 - np.linspace(0, 1, num + 1)[1:]))

    def log_decay(self, num: int) -> np.ndarray:
        return np.log(np.arange(num) + np.e)

    def sigmoid_decay(self, num: int) -> np.ndarray:
        return 1.0 / (1.0 + np.exp(-np.linspace(-5.0, 5.0, num)))

    def visualize(self, export_path: str = "weights_strategy.png") -> None:  # pragma: no cover
        try:
            import matplotlib.pyplot as plt

            n = 1000
            x = np.linspace(0, 1, n)
            y = self(n)
            if y is not None:
                plt.figure()
                plt.plot(x, y)
                plt.savefig(export_path)
                plt.close()
        except ImportError:
            pass


# ----------------------------------------------------------------------------
# misc
# ----------------------------------------------------------------------------

def fix_denormal_states(
    states: Dict[str, np.ndarray],
    *,
    eps: float = 1e-32,
) -> Dict[str, np.ndarray]:
    """Zero out denormal floats in a state dict (reference `toolkit.py:1296`)."""
    out = {}
    for k, v in states.items():
        if np.issubdtype(v.dtype, np.floating):
            v = np.where(np.abs(v) < eps, 0.0, v).astype(v.dtype)
        out[k] = v
    return out


def truncate_string_to_length(string: str, length: int) -> str:
    if len(string) <= length:
        return string
    half = (length - 3) // 2
    return string[:half] + "..." + string[-half:]


def sort_dict_by_value(d: Dict[Any, Any], *, reverse: bool = False) -> "Dict[Any, Any]":
    return dict(sorted(d.items(), key=lambda kv: kv[1], reverse=reverse))


def prod(iterable: Any) -> int:
    out = 1
    for v in iterable:
        out *= int(v)
    return out


def get_num_params(params: Any) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params) if hasattr(x, "shape"))


def timestamp(*, simplify: bool = False, ensure_different: bool = False) -> str:
    now = time.localtime()
    s = time.strftime("%Y-%m-%d_%H-%M-%S", now)
    if not simplify and ensure_different:
        s = f"{s}-{int((time.time() % 1) * 1e6):06d}"
    return s


class ScalarEMA:
    """Host-side scalar EMA tracker used by monitors (reference cftool)."""

    def __init__(self, decay: float = 0.9) -> None:
        self.decay = decay
        self._value: Optional[float] = None

    def update(self, value: float) -> float:
        if self._value is None:
            self._value = value
        else:
            self._value = self.decay * self._value + (1.0 - self.decay) * value
        return self._value

    @property
    def value(self) -> Optional[float]:
        return self._value


# ----------------------------------------------------------------------------
# small parity utilities (reference `toolkit.py` grab-bag)
# ----------------------------------------------------------------------------

class FileInfo(tuple):
    """(sha, st_size) of a file (reference `toolkit.py:246` FileInfo)."""

    def __new__(cls, sha: str, st_size: int) -> "FileInfo":
        return super().__new__(cls, (sha, st_size))

    @property
    def sha(self) -> str:
        return self[0]

    @property
    def st_size(self) -> int:
        return self[1]


def new_seed() -> int:
    """reference `toolkit.py:83` — a fresh random seed."""
    return int(np.random.randint(0, 2**31 - 1))


def get_file_info(path: Union[str, Path]) -> FileInfo:
    """reference `toolkit.py:279` — sha256 + size of a file."""
    p = Path(path)
    with p.open("rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    return FileInfo(sha, get_file_size(str(p)))


def check_available(path: Union[str, Path], *, sha: Optional[str] = None, st_size: Optional[int] = None) -> bool:
    """reference `toolkit.py:254` check_available — verify a downloaded file
    against its recorded info."""
    p = Path(path)
    if not p.is_file():
        return False
    info = get_file_info(p)
    if sha is not None and info.sha != sha:
        return False
    if st_size is not None and info.st_size != st_size:
        return False
    return True


def download_checkpoint(tag: str, *, check_sha: bool = False) -> Path:
    """reference `toolkit.py:524` — download a checkpoint by zoo index tag."""
    from ..zoo.common import resolve_download

    info = resolve_download(tag)
    return download(
        info["url"],
        name=info.get("name"),
        sha=info.get("sha") if check_sha else None,
    )


_warned_once: set = set()


def resolve_checkpoint_policy(name: str) -> Any:
    """Resolve a `jax.checkpoint_policies` name eagerly, with a helpful error.

    `getattr(jax.checkpoint_policies, typo)` would otherwise surface as a
    bare AttributeError — in the UNet case only at trace time, deep inside
    jit. Called at config/__init__ time so typos fail fast.
    """
    policy = getattr(jax.checkpoint_policies, name, None)
    if policy is None:
        valid = sorted(
            n for n in dir(jax.checkpoint_policies) if not n.startswith("_")
        )
        raise ValueError(
            f"unknown remat policy {name!r}; valid jax.checkpoint_policies "
            f"names: {valid}"
        )
    return policy


def warn_once(message: str, *, key: Optional[str] = None) -> None:
    """reference `toolkit.py:816` — emit each warning message only once."""
    import warnings

    k = key or message
    if k not in _warned_once:
        _warned_once.add(k)
        warnings.warn(message)


def show_or_save(export_path: Optional[str], fig: Any = None, **kwargs: Any) -> None:
    """reference `toolkit.py:614` — save the figure if a path is given, else
    show it (matplotlib optional)."""
    import matplotlib.pyplot as plt

    if export_path is None:
        (fig or plt).show(**kwargs)
    else:
        if fig is not None:
            fig.savefig(export_path)
        else:
            plt.savefig(export_path, **kwargs)
    plt.close()


def show_or_return(return_canvas: bool) -> Optional[np.ndarray]:
    """reference `toolkit.py:645` — show the current plt figure, or return it
    as an RGBA canvas array."""
    import matplotlib.pyplot as plt

    if not return_canvas:
        plt.show()
        return None
    import io

    buf = io.BytesIO()
    plt.savefig(buf, format="png")
    plt.close()
    buf.seek(0)
    from PIL import Image

    return np.array(Image.open(buf))


def safe_clip(net: arr_type) -> arr_type:
    """reference `toolkit.py:1236` `safe_clip_` — clip to the dtype's finite
    range (functional: jax arrays are immutable, so this returns)."""
    if isinstance(net, np.ndarray):
        fin = np.finfo(net.dtype)
        return np.clip(net, fin.min, fin.max)
    fin = jnp.finfo(net.dtype)
    return jnp.clip(net, fin.min, fin.max)


def insert_intermediate_dims(net: arr_type, ref: arr_type) -> arr_type:
    """reference `toolkit.py:1258` — expand a 2D array to ref's ndim by
    inserting singleton dims after the batch dim."""
    dim_diff = ref.ndim - net.ndim
    if dim_diff == 0:
        return net
    shape = (net.shape[0],) + (1,) * dim_diff + net.shape[1:]
    return net.reshape(shape)


def to_2d(arr: Any) -> Any:
    """reference `toolkit.py:2653` — coerce array-likes to 2D columns."""
    if arr is None or isinstance(arr, str):
        return None
    if isinstance(arr, (list, tuple)) and arr and not isinstance(arr[0], (list, tuple)):
        return [[x] for x in arr]
    a = np.asarray(arr) if not isinstance(arr, (np.ndarray, jax.Array)) else arr
    if getattr(a, "ndim", None) == 1:
        return a.reshape(-1, 1)
    return arr if isinstance(arr, (list, tuple)) else a


def inject_parameters(
    src: Any,
    tgt: Any,
    *,
    strict: bool = True,
    src_filter_fn: Optional[Callable[[str], bool]] = None,
    tgt_filter_fn: Optional[Callable[[str], bool]] = None,
    custom_mappings: Optional[Dict[str, str]] = None,
    states_callback: Optional[Callable[[Dict[str, np.ndarray]], Dict[str, np.ndarray]]] = None,
) -> None:
    """reference `toolkit.py:1372` — copy parameters from one module into
    another by path, with optional filtering/renaming."""
    from flax import nnx

    from .tree import npd_to_tree, tree_to_npd

    src_npd = tree_to_npd(nnx.state(src, nnx.Param))
    if src_filter_fn is not None:
        src_npd = {k: v for k, v in src_npd.items() if src_filter_fn(k)}
    if custom_mappings:
        src_npd = {custom_mappings.get(k, k): v for k, v in src_npd.items()}
    if states_callback is not None:
        src_npd = states_callback(src_npd)
    tgt_state = nnx.state(tgt, nnx.Param)
    if tgt_filter_fn is not None:
        keep = {k for k in tree_to_npd(tgt_state) if tgt_filter_fn(k)}
        src_npd = {k: v for k, v in src_npd.items() if k in keep}
    nnx.update(tgt, npd_to_tree(src_npd, tgt_state, strict=strict and tgt_filter_fn is None))


def has_batch_norms(module: Any) -> bool:
    """reference `toolkit.py:1496` — whether any submodule is a batch norm
    (matters for EMA/SWA-style weight averaging and channels-last export)."""
    from flax import nnx

    for _, sub in nnx.iter_graph(module):
        if isinstance(sub, (nnx.BatchNorm,)):
            return True
    return False


def get_tensors(inp: Any) -> Dict[str, np.ndarray]:
    """reference `toolkit.py:1320` — normalize a checkpoint-ish input
    (path to .safetensors/.pt/.ckpt, a raw state dict, or a dict holding
    one under 'state_dict') into a flat {name: ndarray} dict."""
    if isinstance(inp, (str, Path)):
        from ..zoo.convert import load_torch_state_dict

        return load_torch_state_dict(str(inp))
    if isinstance(inp, dict):
        d = inp.get("state_dict", inp)
        return {
            k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in d.items()
        }
    raise ValueError(f"cannot extract tensors from `{type(inp)}`")


class Diffs(tuple):
    """(names, diffs) result of `sorted_param_diffs`."""

    def __new__(cls, names: List[str], diffs: List[float]) -> "Diffs":
        return super().__new__(cls, (names, diffs))

    @property
    def names(self) -> List[str]:
        return self[0]

    @property
    def diffs(self) -> List[float]:
        return self[1]


def sorted_param_diffs(m1: Any, m2: Any) -> Diffs:
    """reference `toolkit.py:1468` — max-abs parameter differences between
    two modules with identical structure, sorted descending."""
    from flax import nnx

    from .tree import tree_to_npd

    d1 = tree_to_npd(nnx.state(m1, nnx.Param))
    d2 = tree_to_npd(nnx.state(m2, nnx.Param))
    if d1.keys() != d2.keys():
        raise ValueError("parameter structures differ")
    pairs = sorted(
        ((k, float(np.abs(np.asarray(d1[k], np.float32) - np.asarray(d2[k], np.float32)).max())) for k in d1),
        key=lambda kv: -kv[1],
    )
    return Diffs([k for k, _ in pairs], [v for _, v in pairs])


def make_indices_visualization_map(indices: arr_type) -> np.ndarray:
    """reference `toolkit.py:2997` — render each index as a 28x28 white tile
    with the number drawn in the center (VQ-VAE codebook visualization).
    Returns float NHWC in [-1, 1]."""
    from PIL import Image, ImageDraw

    flat = np.asarray(indices).reshape(-1)
    tiles = []
    for idx in flat:
        img = Image.new("L", (28, 28), 255)
        draw = ImageDraw.Draw(img)
        text = str(int(idx))
        bbox = draw.textbbox((0, 0), text)
        tw, th = bbox[2] - bbox[0], bbox[3] - bbox[1]
        draw.text(((28 - tw) / 2 - bbox[0], (28 - th) / 2 - bbox[1]), text, fill=0)
        tiles.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    return np.stack(tiles)[..., None]


# reference type aliases (`schema.py:82-85`)
param_type = arr_type
losses_type = Union[jax.Array, tensor_dict_type]
