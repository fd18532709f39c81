from .registry import Registry, WithRegister
from .serialization import DataClassBase, ISerializable, Serializer
from .block_pipeline import IBlock, IPipeline
from .misc import (
    WeightsStrategy,
    ScalarEMA,
    adain_with_params,
    adain_with_tgt,
    check_is_ci,
    check_sha_with,
    download,
    download_json,
    fix_denormal_states,
    get_file_info,
    get_latest_workspace,
    get_num_params,
    make_indices_visualization_map,
    random_hash,
    get_seed,
    get_tensors,
    has_batch_norms,
    inject_parameters,
    show_or_return,
    sorted_param_diffs,
    to_2d,
    hash_code,
    jax_batch_to_np,
    mean_std,
    new_rng_key,
    np_batch_to_jax,
    np_dict_type,
    prod,
    seed_everything,
    slerp,
    sort_dict_by_value,
    tensor_dict_type,
    timestamp,
    to_jax_dtype,
    truncate_string_to_length,
)
from .init_summary import Initializer, summary
from .contexts import auto_num_layers, eval_context, gradient_checkpoint, no_grad_context, train_context
from ..ops.attention import sdp_attn  # reference `toolkit.py:911` parity
