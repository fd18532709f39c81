from .config import Config, DLConfig, MLConfig, MeshConfig, TrainerConfig
from .data import (
    DataBundle,
    DataConfig,
    DataProcessor,
    DataProcessorConfig,
    IData,
    IDataBlock,
    IDataLoader,
    IDataset,
    INoInitDataBlock,
    data_type,
    norm_sw,
)
from .losses_schema import ILoss, build_loss, loss_dict_type
from .metrics_schema import IMetric, MetricsOutputs, MultipleMetrics, weighted_loss_score
from .model import IDLModel, StepOutputs, TrainStep, forward_results_type
from .train_schema import (
    ITrainer,
    MonitorResults,
    TrainerCallback,
    TrainerMonitor,
    TrainerState,
)
