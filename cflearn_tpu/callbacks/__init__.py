from .general import ArtifactCallback, LogMetricsMsgCallback, MLFlowCallback
