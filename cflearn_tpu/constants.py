"""Batch-dict keys and checkpoint naming constants.

Parity: reference `cflearn/constants.py:1-26` — the batch contract (`input`,
`labels`, `predictions`, ...) is preserved verbatim so data/model/metric layers
speak the same dict language as the reference.
"""

INPUT_KEY = "input"
LABEL_KEY = "labels"
PREDICTIONS_KEY = "predictions"
LOSS_KEY = "loss"
AUX_LOSS_KEY = "aux_loss"
LATENT_KEY = "latent"
MU_KEY = "mu"
LOG_VAR_KEY = "log_var"
BATCH_INDICES_KEY = "batch_indices"
ORIGINAL_LABEL_KEY = "original_labels"

INFO_PREFIX = "> "
WARNING_PREFIX = "> [warning] "
ERROR_PREFIX = "> [error] "

# checkpoint naming (reference `constants.py`: PT_PREFIX="model_", SCORES_FILE)
CKPT_PREFIX = "model_"
SCORES_FILE = "scores.json"
CHECKPOINTS_FOLDER = "checkpoints"

DEFAULT_ZOO_TAG = "default"
WORKSPACE_ENVIRON_KEY = "CFLEARN_TPU_WORKSPACE"
